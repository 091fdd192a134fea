"""Packed inference tail (ops/packed_tail.py): exact-math parity with the
plain full-resolution path, plus end-to-end voting from the packed field."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.ops import packed_tail as pt
from pvnet_tpu.ops import voting


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model("resnet18_8s", ver_dim=6, seg_dim=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


def unpack(packed, hout):
    b, h2, w2, _ = packed.shape
    p = np.asarray(packed).reshape(b, h2, w2, 2, 2, hout)
    return p.transpose(0, 1, 3, 2, 4, 5).reshape(b, 2 * h2, 2 * w2, hout)


class TestParity:
    def test_matches_plain_forward_f32(self, model_and_vars):
        model, variables, x = model_and_vars
        seg, ver = model.apply(variables, x, train=False)
        full = np.concatenate([np.asarray(seg), np.asarray(ver)], -1)

        fm = model.apply(variables, x, train=False, return_2s_features=True)
        assert fm.shape == (2, 16, 32, 32)
        packed, fgcnt = pt.packed_tail_from_variables(
            variables, fm, x, dtype=jnp.float32)
        got = unpack(packed, 8)
        np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-5)

        # fgcnt counts the argmax-foreground sub-pixels per 2x2 cell
        mask = (full[..., 1] > full[..., 0]).astype(np.float32)
        ref_cnt = mask.reshape(2, 16, 2, 32, 2).sum(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(fgcnt), ref_cnt)

    def test_bf16_close(self, model_and_vars):
        model, variables, x = model_and_vars
        seg, ver = model.apply(variables, x, train=False)
        full = np.concatenate([np.asarray(seg), np.asarray(ver)], -1)
        fm = model.apply(variables, x, train=False, return_2s_features=True)
        packed, _ = pt.packed_tail_from_variables(
            variables, fm, x, dtype=jnp.bfloat16)
        got = unpack(packed, 8)
        # bf16 matmul rounding only: tiny relative to the field's scale
        scale = np.abs(full).max()
        assert np.abs(got - full).max() < 0.02 * scale
        assert np.corrcoef(got.ravel(), full.ravel())[0, 1] > 0.999

    def test_jit_traceable(self, model_and_vars):
        model, variables, x = model_and_vars

        @jax.jit
        def run(v, img):
            fm = model.apply(v, img, train=False, return_2s_features=True)
            return pt.packed_tail_from_variables(v, fm, img,
                                                 dtype=jnp.float32)

        packed, fgcnt = run(variables, x)
        assert packed.shape == (2, 16, 32, 32)
        assert np.isfinite(np.asarray(packed)).all()


class TestVotingFromPacked:
    def test_keypoints_recovered_from_packed_gt_field(self):
        # build a GT field, fold it into "raw stage = identity-ish" —
        # instead feed the packed sampler a packed GT head field directly
        from tests.test_voting import make_field, KPTS, BOX
        mask, vertex = make_field(128, 128, KPTS, BOX)
        seg = np.stack([1.0 - 2 * mask, 2.0 * mask - 1], -1)
        out = np.concatenate([seg, vertex.reshape(128, 128, 6)],
                             -1).astype(np.float32)[None]
        b, h, w, hout = out.shape
        p = out.reshape(b, h // 2, 2, w // 2, 2, hout)
        packed = jnp.asarray(p.transpose(0, 1, 3, 2, 4, 5).reshape(
            b, h // 2, w // 2, 4 * hout))
        fgcnt = jnp.asarray(
            mask.reshape(64, 2, 64, 2).sum(axis=(1, 3)), jnp.float32)[None]
        fg = voting.sample_foreground_packed(packed, fgcnt, 512,
                                             jax.random.PRNGKey(0))
        kps = voting.ransac_voting_v3_from_fg(fg, jax.random.PRNGKey(1),
                                              hyp_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(kps[0]), KPTS, atol=0.5)


class TestDeepPacked:
    """tail_depth=2: the 2s decoder stage also runs on the packed lattice."""

    def test_conv2s_matches_plain_forward_f32(self, model_and_vars):
        model, variables, x = model_and_vars
        seg, ver = model.apply(variables, x, train=False)
        full = np.concatenate([np.asarray(seg), np.asarray(ver)], -1)

        fm4, x2s = model.apply(variables, x, train=False,
                               return_4s_features=True)
        assert fm4.shape == (2, 8, 16, 64)
        assert x2s.shape == (2, 16, 32, 64)
        packed, fgcnt = pt.packed_tail_deep_from_variables(
            variables, fm4, x2s, x, dtype=jnp.float32)
        got = unpack(packed, 8)
        np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-5)

        mask = (full[..., 1] > full[..., 0]).astype(np.float32)
        ref_cnt = mask.reshape(2, 16, 2, 32, 2).sum(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(fgcnt), ref_cnt)

    def test_packed_conv2s_matches_plain_2s_features(self, model_and_vars):
        model, variables, x = model_and_vars
        fm2 = model.apply(variables, x, train=False, return_2s_features=True)
        fm4, x2s = model.apply(variables, x, train=False,
                               return_4s_features=True)
        p = variables["params"]
        bs = variables["batch_stats"]
        cp = pt.fold_packed_conv2s(
            p["Conv_3"]["kernel"], p["BatchNorm_3"]["scale"],
            p["BatchNorm_3"]["bias"], bs["BatchNorm_3"]["mean"],
            bs["BatchNorm_3"]["var"], fm4.shape[-1],
            x2s.shape[1], x2s.shape[2])
        fm2p = pt.run_packed_conv2s(fm4, x2s, cp, dtype=jnp.float32)
        got = unpack(np.asarray(fm2p), fm2.shape[-1])
        np.testing.assert_allclose(got, np.asarray(fm2), rtol=2e-4,
                                   atol=2e-5)

    def test_phase_upsample_from_packed_matches_unpacked(self):
        rng = np.random.RandomState(3)
        fm2 = rng.randn(1, 8, 12, 5).astype(np.float32)
        ah = jnp.asarray(pt._shifted_phase_matrices(16, 8))
        aw = jnp.asarray(pt._shifted_phase_matrices(24, 12))
        ref = pt.phase_upsample_packed(jnp.asarray(fm2), ah, aw,
                                       dtype=jnp.float32)
        p = fm2.reshape(1, 4, 2, 6, 2, 5).transpose(0, 1, 3, 2, 4, 5)
        fmp = jnp.asarray(p.reshape(1, 4, 6, 20))
        got = pt.phase_upsample_from_packed(fmp, ah, aw, dtype=jnp.float32)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_bf16_close(self, model_and_vars):
        model, variables, x = model_and_vars
        seg, ver = model.apply(variables, x, train=False)
        full = np.concatenate([np.asarray(seg), np.asarray(ver)], -1)
        fm4, x2s = model.apply(variables, x, train=False,
                               return_4s_features=True)
        packed, _ = pt.packed_tail_deep_from_variables(
            variables, fm4, x2s, x, dtype=jnp.bfloat16)
        got = unpack(packed, 8)
        scale = np.abs(full).max()
        assert np.abs(got - full).max() < 0.04 * scale
        assert np.corrcoef(got.ravel(), full.ravel())[0, 1] > 0.995

    def test_pipeline_tail_depth_2(self, model_and_vars):
        from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline
        model, variables, x = model_and_vars
        K = np.array([[60.0, 0, 32], [0, 60, 16], [0, 0, 1]], np.float32)
        pts = np.random.RandomState(0).randn(3, 3).astype(np.float32) * 0.05
        run = jax.jit(make_pose_pipeline(
            model.apply, pts, K, params=VoteParams(hyp_num=64, max_num=64),
            fused_tail=True, tail_depth=2))
        pose, kps = run(variables, x, jax.random.PRNGKey(0))
        assert pose.shape == (2, 3, 4)
        assert np.isfinite(np.asarray(kps)).all()


class TestDepth3:
    def test_matches_plain_forward_f32(self, model_and_vars):
        model, variables, x = model_and_vars
        seg, ver = model.apply(variables, x, train=False)
        full = np.concatenate([np.asarray(seg), np.asarray(ver)], -1)
        fm8, x4s, x2s = model.apply(variables, x, train=False,
                                    return_8s_features=True)
        assert fm8.shape == (2, 4, 8, 128)
        assert x4s.shape == (2, 8, 16, 64)
        packed, fgcnt = pt.packed_tail_deep3_from_variables(
            variables, fm8, x4s, x2s, x, dtype=jnp.float32)
        got = unpack(packed, 8)
        np.testing.assert_allclose(got, full, rtol=2e-4, atol=2e-5)

    def test_pipeline_tail_depth_3(self, model_and_vars):
        from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline
        model, variables, x = model_and_vars
        K = np.array([[60.0, 0, 32], [0, 60, 16], [0, 0, 1]], np.float32)
        pts = np.random.RandomState(0).randn(3, 3).astype(np.float32) * 0.05
        run = jax.jit(make_pose_pipeline(
            model.apply, pts, K, params=VoteParams(hyp_num=64, max_num=64),
            fused_tail=True, tail_depth=3))
        pose, kps = run(variables, x, jax.random.PRNGKey(0))
        assert pose.shape == (2, 3, 4)
        assert np.isfinite(np.asarray(kps)).all()


class TestFoldConvDirect:
    """The skip/image term algebra: conv2x2(pack_feature(x), packed_w) ==
    conv4x4_stride2(pad(x, 1), _fold_conv_direct(w)) — the identity that
    lets run_packed_stage/run_packed_tail skip materializing the packed
    operand (its pack op alone cost 7-13 ms/tensor at batch 128)."""

    def test_direct_equals_pack_then_conv(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 12, 16, 5).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 5, 4).astype(np.float32))
        wp = pt._pack_conv_weights(w)                  # [2,2,20,16]
        xp = pt.pack_feature(x, dtype=jnp.float32)     # [2,7,9,20]
        ref = jax.lax.conv_general_dilated(
            xp, wp, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        wd = pt._fold_conv_direct(w)                   # [4,4,5,16]
        got = pt._conv_skip_direct(x, wd, jnp.float32, jnp.float32)
        np.testing.assert_allclose(np.asarray(ref), np.asarray(got),
                                   rtol=1e-5, atol=1e-5)

    def test_direct_term_matches_full_conv_semantics(self):
        # the packed term must equal the full-res 3x3 SAME conv, packed
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 8, 10, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(3, 3, 3, 2).astype(np.float32))
        full = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))  # [1,8,10,2]
        got = pt._conv_skip_direct(x, pt._fold_conv_direct(w),
                                   jnp.float32, jnp.float32)  # [1,4,5,8]
        b, hc, wc, c4 = got.shape
        unpacked = got.reshape(b, hc, wc, 2, 2, 2).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, 8, 10, 2)
        np.testing.assert_allclose(np.asarray(full), np.asarray(unpacked),
                                   rtol=1e-5, atol=1e-5)
