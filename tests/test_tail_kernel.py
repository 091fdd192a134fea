"""Fused inference tail: BN-folding exactness vs the model's own forward,
Pallas kernel parity (interpret mode), packed sampling semantics, and the
fused pipeline end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.ops import tail_kernel as TK
from pvnet_tpu.ops import voting
from pvnet_tpu import pipeline as pl_mod


@pytest.fixture(scope="module")
def model_and_vars():
    m = build_model("resnet18_8s", ver_dim=18)
    x = jnp.asarray(np.random.RandomState(0).randn(2, 32, 64, 3),
                    jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x, train=False)
    # make BN stats non-trivial so folding is actually exercised
    bs = jax.tree.map(lambda a: a, variables["batch_stats"])
    rng = np.random.RandomState(1)
    bn4 = dict(bs["BatchNorm_4"])
    bn4["mean"] = jnp.asarray(rng.randn(*bn4["mean"].shape) * 0.1)
    bn4["var"] = jnp.asarray(rng.rand(*bn4["var"].shape) + 0.5)
    bs = dict(bs)
    bs["BatchNorm_4"] = bn4
    variables = {"params": variables["params"], "batch_stats": bs}
    return m, variables, x


def fold_from_vars(variables, cin_pad):
    p = variables["params"]
    bn = variables["batch_stats"]["BatchNorm_4"]
    return TK.fold_tail_params(
        p["Conv_4"]["kernel"], p["BatchNorm_4"]["scale"],
        p["BatchNorm_4"]["bias"], bn["mean"], bn["var"],
        p["Conv_5"]["kernel"], p["Conv_5"]["bias"], cin_pad=cin_pad)


class TestFolding:
    def test_reference_tail_matches_model_forward(self, model_and_vars):
        """Folded-BN reference tail == the model's own seg/ver outputs."""
        m, variables, x = model_and_vars
        seg, ver = m.apply(variables, x, train=False)
        feats = m.apply(variables, x, train=False,
                        return_tail_features=True)
        assert feats.shape[-1] == 64
        tp = fold_from_vars(variables, feats.shape[-1])
        out, fgcnt = TK.pvnet_tail_reference(feats, tp)
        want = jnp.concatenate([seg, ver], axis=-1)
        np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                                   rtol=1e-4, atol=1e-4)
        mask = np.asarray(jnp.argmax(seg, -1))
        cells = mask.reshape(2, 16, 2, 32, 2).sum(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(fgcnt), cells)

    def test_packed_kernel_interpret_matches_reference(self, model_and_vars):
        m, variables, x = model_and_vars
        feats = m.apply(variables, x, train=False,
                        return_tail_features=True)
        tp = fold_from_vars(variables, feats.shape[-1])
        # like-for-like: the kernel computes conv in bf16 with f32
        # accumulation and re-rounds between the conv and head matmuls;
        # compare against the f32 reference on the same bf16 input and
        # allow ~1% full-scale drift.
        fb = feats.astype(jnp.bfloat16)
        out, fg_ref = TK.pvnet_tail_reference(fb.astype(jnp.float32), tp)
        b, h, w, hout = out.shape
        want = np.asarray(out).reshape(b, h // 2, 2, w // 2, 2, hout)
        want = want.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 2, w // 2, 4 * hout)
        with pltpu.force_tpu_interpret_mode():
            packed, fgcnt = TK.pvnet_tail_packed(fb, tp, row_tile=4)
        got = np.asarray(packed, np.float32)
        ad = np.abs(got - want)
        scale = np.abs(want).max()
        assert ad.max() < 0.01 * scale + 0.1, (ad.max(), scale)
        assert ad.mean() < 0.002 * scale + 0.02
        # the decisions that matter downstream: per-pixel fg agreement
        s = got.reshape(b, h // 2, w // 2, 4, hout)
        sw = want.reshape(b, h // 2, w // 2, 4, hout)
        agree = ((s[..., 1] > s[..., 0]) == (sw[..., 1] > sw[..., 0]))
        assert agree.mean() > 0.98
        diff = np.abs(np.asarray(fgcnt) - np.asarray(fg_ref))
        assert (diff > 0).mean() < 0.05


class TestPackedSampling:
    def _packed_from_full(self, out):
        b, h, w, hout = out.shape
        p = out.reshape(b, h // 2, 2, w // 2, 2, hout)
        return p.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 2, w // 2, 4 * hout)

    def test_slots_match_field(self):
        from tests.test_voting import make_field, KPTS, BOX
        mask, vertex = make_field(128, 128, KPTS, BOX)
        seg = np.stack([1.0 - 2 * mask, 2.0 * mask - 1], -1)  # argmax==mask
        out = np.concatenate([seg, vertex.reshape(128, 128, 6)],
                             -1).astype(np.float32)[None]
        packed = jnp.asarray(self._packed_from_full(out))
        fgcnt = jnp.asarray(
            mask.reshape(64, 2, 64, 2).sum(axis=(1, 3)),
            jnp.float32)[None]
        fg = voting.sample_foreground_packed(packed, fgcnt, 256,
                                             jax.random.PRNGKey(0))
        assert int(fg.total[0]) == mask.sum()
        v = np.asarray(fg.valid[0])
        c = np.asarray(fg.coords[0]).astype(int)
        d = np.asarray(fg.dirs[0])
        assert v.sum() > 200                 # box >> budget: most slots fill
        np.testing.assert_allclose(d[v], vertex[c[v, 1], c[v, 0]], rtol=1e-5)
        assert (mask[c[v, 1], c[v, 0]] == 1).all()
        np.testing.assert_allclose(d[~v], 0.0)

    def test_packed_valid_slots_form_contiguous_prefix(self):
        # boundary cells with 1-3 foreground sub-pixels (and small objects
        # leaving phase buckets empty) must not interleave invalid slots
        # through the pair-sampling range [0, count)
        from tests.test_voting import make_field, KPTS
        mask, vertex = make_field(128, 128, KPTS, (11, 18, 21, 26))
        seg = np.stack([1.0 - 2 * mask, 2.0 * mask - 1], -1)
        out = np.concatenate([seg, vertex.reshape(128, 128, 6)],
                             -1).astype(np.float32)[None]
        packed = jnp.asarray(self._packed_from_full(out))
        fgcnt = jnp.asarray(
            mask.reshape(64, 2, 64, 2).sum(axis=(1, 3)),
            jnp.float32)[None]
        fg = voting.sample_foreground_packed(packed, fgcnt, 256,
                                             jax.random.PRNGKey(0))
        v = np.asarray(fg.valid[0])
        cnt = int(fg.count[0])
        assert 0 < cnt < 256
        assert v[:cnt].all() and not v[cnt:].any()
        kps = voting.ransac_voting_v3_from_fg(fg, jax.random.PRNGKey(1),
                                              hyp_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(kps[0]), KPTS, atol=0.5)

    def test_voting_recovers_keypoints_from_packed(self):
        from tests.test_voting import make_field, KPTS, BOX
        mask, vertex = make_field(128, 128, KPTS, BOX)
        seg = np.stack([1.0 - 2 * mask, 2.0 * mask - 1], -1)
        out = np.concatenate([seg, vertex.reshape(128, 128, 6)],
                             -1).astype(np.float32)[None]
        packed = jnp.asarray(self._packed_from_full(out))
        fgcnt = jnp.asarray(
            mask.reshape(64, 2, 64, 2).sum(axis=(1, 3)),
            jnp.float32)[None]
        fg = voting.sample_foreground_packed(packed, fgcnt, 512,
                                             jax.random.PRNGKey(0))
        kps = voting.ransac_voting_v3_from_fg(fg, jax.random.PRNGKey(1),
                                              hyp_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(kps[0]), KPTS, atol=0.5)


class TestFusedPipeline:
    def test_pipeline_runs_and_matches_plain_total(self, model_and_vars):
        m, variables, x = model_and_vars
        rng = np.random.RandomState(0)
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        K = np.array([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]], np.float32)
        run = pl_mod.make_pose_pipeline(
            m.apply, pts3d, K,
            params=pl_mod.VoteParams(hyp_num=64, max_num=64),
            fused_tail=True)
        pose, kps = jax.jit(run)(variables, x, jax.random.PRNGKey(1))
        assert pose.shape == (2, 3, 4) and kps.shape == (2, 9, 2)
        assert np.isfinite(np.asarray(pose)).all()

        # foreground totals agree with the plain mask path up to bf16
        # borderline-pixel argmax flips (the packed tail computes the seg
        # logits in bf16; exact-math parity is tested in test_packed_tail)
        fg = pl_mod.fused_tail_foreground(m.apply, variables, x, 64,
                                          jax.random.PRNGKey(2))
        seg, _ = m.apply(variables, x, train=False)
        total_ref = np.asarray(jnp.argmax(seg, -1).sum(axis=(1, 2)))
        diff = np.abs(np.asarray(fg.total) - total_ref)
        # random-init logits sit near zero, so a few percent of pixels are
        # within one bf16 ulp of the argmax boundary; trained fields have
        # sharp margins (exact-math parity is in test_packed_tail)
        assert (diff <= np.maximum(4, 0.025 * total_ref)).all(), \
            (np.asarray(fg.total), total_ref)

    def test_uncertainty_variant_runs(self, model_and_vars):
        m, variables, x = model_and_vars
        rng = np.random.RandomState(0)
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        K = np.array([[100.0, 0, 32], [0, 100.0, 16], [0, 0, 1]], np.float32)
        run = pl_mod.make_pose_pipeline(
            m.apply, pts3d, K,
            params=pl_mod.VoteParams(hyp_num=64, max_num=64,
                                     uncertainty_hyp_num=128),
            uncertainty=True, fused_tail=True)
        pose, kps = jax.jit(run)(variables, x, jax.random.PRNGKey(1))
        assert np.isfinite(np.asarray(pose)).all()
