"""Loss + trainer tests, including a sharded data-parallel step on the
virtual 8-device CPU mesh and a checkpoint save/restore round trip."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import TrainConfig
from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.parallel import make_mesh, shard_batch, replicate
from pvnet_tpu.train import loss as loss_mod
from pvnet_tpu.train import trainer as trainer_mod
from pvnet_tpu.train.checkpoint import load_model, save_model


def _np_smooth_l1(pred, target, weights, sigma=1.0):
    """Direct numpy transcription of ref net_utils.py:54-79."""
    b = pred.shape[0]
    ver_dim = pred.shape[-1]
    sigma2 = sigma ** 2
    diff = weights * (pred - target)
    abs_diff = np.abs(diff)
    sign = (abs_diff < 1.0 / sigma2).astype(np.float32)
    in_loss = (diff ** 2) * (sigma2 / 2.0) * sign \
        + (abs_diff - 0.5 / sigma2) * (1.0 - sign)
    total = in_loss.reshape(b, -1).sum(1)
    return total / (ver_dim * weights.reshape(b, -1).sum(1) + 1e-3)


class TestLosses:
    def test_smooth_l1_matches_reference_math(self, rng):
        pred = rng.randn(2, 8, 8, 6).astype(np.float32) * 2
        target = rng.randn(2, 8, 8, 6).astype(np.float32)
        w = (rng.rand(2, 8, 8, 1) < 0.5).astype(np.float32)
        got = np.asarray(loss_mod.smooth_l1_vertex_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w)))
        expect = _np_smooth_l1(pred, target, w)
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_seg_loss_matches_torch_ce(self, rng):
        import torch
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        labels = rng.randint(0, 3, (2, 8, 8))
        got = np.asarray(loss_mod.seg_loss(jnp.asarray(logits),
                                           jnp.asarray(labels)))
        tl = torch.nn.functional.cross_entropy(
            torch.from_numpy(logits).permute(0, 3, 1, 2),
            torch.from_numpy(labels).long(), reduction="none")
        expect = tl.reshape(2, -1).mean(1).numpy()
        np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)

    def test_precision_recall(self, rng):
        logits = np.zeros((1, 4, 4, 2), np.float32)
        logits[..., 1] = -1.0
        logits[0, :2, :, 1] = 1.0          # predict fg on top half
        mask = np.zeros((1, 4, 4), np.int64)
        mask[0, :, :2] = 1                 # gt fg on left half
        p, r = loss_mod.precision_recall(jnp.asarray(logits),
                                         jnp.asarray(mask))
        # tp=4, fp=4, fn=4 -> precision=recall=(4+1)/(4+4+1)
        np.testing.assert_allclose(float(p[0]), 5 / 9, rtol=1e-6)
        np.testing.assert_allclose(float(r[0]), 5 / 9, rtol=1e-6)


class TestLossChannelMajor:
    """channel_axis=1 (NCHW-head) loss forms must match the NHWC ones
    exactly — the cmajor path exists purely for HBM layout (train/loss.py
    docstring), not different math."""

    def test_seg_loss_layouts_agree(self, rng):
        logits = rng.randn(2, 8, 8, 3).astype(np.float32)
        labels = rng.randint(0, 3, (2, 8, 8))
        a = loss_mod.seg_loss(jnp.asarray(logits), jnp.asarray(labels))
        b = loss_mod.seg_loss(jnp.asarray(logits.transpose(0, 3, 1, 2)),
                              jnp.asarray(labels), channel_axis=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_smooth_l1_layouts_agree(self, rng):
        pred = rng.randn(2, 8, 8, 6).astype(np.float32)
        target = rng.randn(2, 8, 8, 6).astype(np.float32)
        w = (rng.rand(2, 8, 8, 1) < 0.5).astype(np.float32)
        a = loss_mod.smooth_l1_vertex_loss(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(w))
        b = loss_mod.smooth_l1_vertex_loss(
            jnp.asarray(pred.transpose(0, 3, 1, 2)),
            jnp.asarray(target.transpose(0, 3, 1, 2)),
            jnp.asarray(w.transpose(0, 3, 1, 2)), channel_axis=1)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)

    def test_precision_recall_layouts_agree(self, rng):
        logits = rng.randn(3, 8, 8, 2).astype(np.float32)
        mask = rng.randint(0, 2, (3, 8, 8))
        pa, ra = loss_mod.precision_recall(jnp.asarray(logits),
                                           jnp.asarray(mask))
        pb, rb = loss_mod.precision_recall(
            jnp.asarray(logits.transpose(0, 3, 1, 2)), jnp.asarray(mask),
            channel_axis=1)
        np.testing.assert_allclose(np.asarray(pa), np.asarray(pb))
        np.testing.assert_allclose(np.asarray(ra), np.asarray(rb))

    def test_vertex_targets_layouts_agree(self, rng):
        from pvnet_tpu.data.vertex import compute_vertex_targets
        mask = (rng.rand(2, 16, 16) < 0.3).astype(np.int32)
        hc = np.concatenate([rng.rand(2, 5, 2) * 16, np.ones((2, 5, 1))],
                            axis=-1).astype(np.float32)
        a = np.asarray(compute_vertex_targets(jnp.asarray(mask),
                                              jnp.asarray(hc)))
        b = np.asarray(compute_vertex_targets(jnp.asarray(mask),
                                              jnp.asarray(hc),
                                              layout="NCHW"))
        np.testing.assert_allclose(a.transpose(0, 3, 1, 2), b, rtol=1e-6)


def _tiny_batch(rng, b=8, h=32, w=32, vd=6):
    return {
        "image": rng.randn(b, h, w, 3).astype(np.float32),
        "mask": rng.randint(0, 2, (b, h, w)).astype(np.int32),
        "vertex": rng.randn(b, h, w, vd).astype(np.float32),
        "vertex_weights": (rng.rand(b, h, w, 1) < 0.5).astype(np.float32),
    }


class TestTrainer:
    def test_lr_schedule(self):
        cfg = TrainConfig()
        assert trainer_mod.lr_for_epoch(cfg, 0) == pytest.approx(1e-3)
        assert trainer_mod.lr_for_epoch(cfg, 19) == pytest.approx(1e-3)
        assert trainer_mod.lr_for_epoch(cfg, 20) == pytest.approx(5e-4)
        assert trainer_mod.lr_for_epoch(cfg, 40) == pytest.approx(2.5e-4)
        assert trainer_mod.lr_for_epoch(cfg, 199) == pytest.approx(1e-5)

    def test_train_step_reduces_loss(self, rng):
        cfg = TrainConfig()
        model = build_model("resnet18_8s", ver_dim=6)
        state = trainer_mod.create_train_state(
            model, cfg, (2, 32, 32, 3), jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng, b=2).items()}
        step = jax.jit(trainer_mod.train_step)
        losses = []
        for _ in range(5):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert int(state.step) == 5

    def test_train_step_nchw_head_matches_nhwc(self, rng):
        """The channel-major training path (NCHW head + channel_axis=1
        loss + cmajor vertex targets) is a pure layout change: same
        params in, same metrics and same updated params out."""
        cfg = TrainConfig()
        m_nhwc = build_model("resnet18_8s", ver_dim=6)
        m_nchw = build_model("resnet18_8s", ver_dim=6,
                             head_layout="NCHW")
        state = trainer_mod.create_train_state(
            m_nhwc, cfg, (2, 32, 32, 3), jax.random.PRNGKey(0))
        state_c = trainer_mod.create_train_state(
            m_nchw, cfg, (2, 32, 32, 3), jax.random.PRNGKey(0))
        # identical param trees by construction (_HeadConvCMajor contract)
        state_c = state_c.replace(params=state.params,
                                  batch_stats=state.batch_stats)
        b = _tiny_batch(rng, b=2)
        b.pop("vertex")
        b["hcoords"] = np.concatenate(
            [rng.rand(2, 3, 2).astype(np.float32) * 32,
             np.ones((2, 3, 1), np.float32)], axis=-1)
        batch = {k: jnp.asarray(v) for k, v in b.items()}
        import functools
        s1, m1 = jax.jit(trainer_mod.train_step)(state, batch)
        s2, m2 = jax.jit(functools.partial(
            trainer_mod.train_step, head_layout="NCHW"))(state_c, batch)
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m2[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)

        # compare raw gradients (post-Adam params would amplify f32
        # reduction-order noise on near-zero grads into +-lr sign flips)
        from pvnet_tpu.train.loss import total_loss
        from pvnet_tpu.data.vertex import compute_vertex_targets

        def grads_of(st, layout):
            vert = compute_vertex_targets(batch["mask"], batch["hcoords"],
                                          layout=layout)
            vw = batch["vertex_weights"]
            if layout == "NCHW":
                vw = vw.reshape(vw.shape[0], 1, *vw.shape[1:3])

            def loss_fn(params):
                (sp, vp), _ = st.apply_fn(
                    {"params": params, "batch_stats": st.batch_stats},
                    batch["image"], train=True, mutable=["batch_stats"])
                loss, _ = total_loss(
                    sp, vp, batch["mask"], vert, vw,
                    channel_axis=1 if layout == "NCHW" else -1)
                return loss
            return jax.grad(loss_fn)(st.params)

        g1 = jax.tree_util.tree_leaves(grads_of(state, "NHWC"))
        g2 = jax.tree_util.tree_leaves(grads_of(state_c, "NCHW"))
        for a, bb in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(bb),
                                       rtol=1e-3, atol=1e-5)

    def test_sharded_train_step_8_devices(self, rng):
        assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"
        cfg = TrainConfig()
        mesh = make_mesh()
        assert mesh.shape["data"] == 8
        model = build_model("resnet18_8s", ver_dim=6)
        state = trainer_mod.create_train_state(
            model, cfg, (8, 32, 32, 3), jax.random.PRNGKey(0))
        state = replicate(state, mesh)
        batch = shard_batch(
            {k: jnp.asarray(v) for k, v in _tiny_batch(rng, b=8).items()},
            mesh)
        step = trainer_mod.make_sharded_train_step(mesh, donate=False)
        state2, metrics = step(state, batch)
        assert np.isfinite(float(metrics["loss"]))
        # params changed and stayed replicated
        p0 = jax.tree_util.tree_leaves(state.params)[0]
        p1 = jax.tree_util.tree_leaves(state2.params)[0]
        assert not np.allclose(np.asarray(p0), np.asarray(p1))

    def test_make_mesh_rejects_multi_host(self, monkeypatch):
        # shard_batch/replicate device_put host-local data; a silent global
        # mesh under process_count > 1 would corrupt batches
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        with pytest.raises(NotImplementedError, match="single process"):
            make_mesh()
        # explicit device list stays allowed (caller owns the sharding)
        mesh = make_mesh(devices=jax.devices())
        assert mesh.shape["data"] == 8

    def test_sharded_matches_single_device(self, rng):
        """The data-parallel step must compute the same update as an
        unsharded step on the full batch (sync-BN + global loss)."""
        cfg = TrainConfig()
        model = build_model("resnet18_8s", ver_dim=6)
        batch_np = _tiny_batch(rng, b=8)
        batch = {k: jnp.asarray(v) for k, v in batch_np.items()}

        state_a = trainer_mod.create_train_state(
            model, cfg, (8, 32, 32, 3), jax.random.PRNGKey(0))
        _, metrics_a = jax.jit(trainer_mod.train_step)(state_a, batch)

        mesh = make_mesh()
        state_b = trainer_mod.create_train_state(
            model, cfg, (8, 32, 32, 3), jax.random.PRNGKey(0))
        state_b = replicate(state_b, mesh)
        sharded = shard_batch(batch, mesh)
        step = trainer_mod.make_sharded_train_step(mesh, donate=False)
        _, metrics_b = step(state_b, sharded)
        np.testing.assert_allclose(float(metrics_a["loss"]),
                                   float(metrics_b["loss"]), rtol=1e-4)

    def test_set_learning_rate(self):
        cfg = TrainConfig()
        model = build_model("resnet18_8s", ver_dim=6)
        state = trainer_mod.create_train_state(
            model, cfg, (1, 32, 32, 3), jax.random.PRNGKey(0))
        state = trainer_mod.set_learning_rate(state, 1e-4)
        assert float(state.opt_state.hyperparams["learning_rate"]) == \
            pytest.approx(1e-4)


class TestCheckpoint:
    def test_save_restore_roundtrip(self, rng):
        cfg = TrainConfig()
        model = build_model("resnet18_8s", ver_dim=6)
        state = trainer_mod.create_train_state(
            model, cfg, (1, 32, 32, 3), jax.random.PRNGKey(0))
        batch = {k: jnp.asarray(v) for k, v in _tiny_batch(rng, b=1).items()}
        state, _ = jax.jit(trainer_mod.train_step)(state, batch)

        with tempfile.TemporaryDirectory() as d:
            save_model(state, epoch=3, model_dir=d)
            fresh = trainer_mod.create_train_state(
                model, cfg, (1, 32, 32, 3), jax.random.PRNGKey(1))
            restored, begin = load_model(fresh, d, epoch=-1)
            assert begin == 4
            for a, b in zip(jax.tree_util.tree_leaves(state.params),
                            jax.tree_util.tree_leaves(restored.params)):
                np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_missing_dir_cold_start(self):
        cfg = TrainConfig()
        model = build_model("resnet18_8s", ver_dim=6)
        state = trainer_mod.create_train_state(
            model, cfg, (1, 32, 32, 3), jax.random.PRNGKey(0))
        _, begin = load_model(state, "/nonexistent/path", epoch=-1)
        assert begin == 0


def test_compute_precision_multi_class():
    import jax.numpy as jnp
    from pvnet_tpu.train.loss import compute_precision_multi_class
    logits = np.zeros((2, 4, 4, 3), np.float32)
    logits[0, ..., 1] = 5.0      # image 0 predicts class 1 everywhere
    logits[1, ..., 2] = 5.0      # image 1 predicts class 2 everywhere
    mask = np.ones((2, 4, 4), np.int32)
    mask[1, :2] = 2              # image 1: half the pixels are class 2
    acc = np.asarray(compute_precision_multi_class(jnp.asarray(logits),
                                                   jnp.asarray(mask)))
    np.testing.assert_allclose(acc, [1.0, 0.5])
    m = compute_precision_multi_class(jnp.asarray(logits),
                                      jnp.asarray(mask), reduce=True)
    np.testing.assert_allclose(float(m), 0.75)


def test_load_net_restores_weights_only(tmp_path):
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.config import TrainConfig
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.train import trainer as trainer_mod
    from pvnet_tpu.train.checkpoint import save_model, load_net

    model = build_model("resnet18_8s", ver_dim=4, seg_dim=2)
    state = trainer_mod.create_train_state(model, TrainConfig(), (1, 32, 32, 3),
                                           jax.random.PRNGKey(0))
    d = str(tmp_path / "ckpt")
    save_model(state, epoch=3, model_dir=d)

    state2 = trainer_mod.create_train_state(model, TrainConfig(), (1, 32, 32, 3),
                                            jax.random.PRNGKey(7))
    restored, begin = load_net(state2, d)
    assert begin == 4
    a = jax.tree_util.tree_leaves(restored.params)
    b = jax.tree_util.tree_leaves(state.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # optimizer state untouched (still state2's)
    assert restored.step == state2.step

    # missing dir -> cold start
    _, begin0 = load_net(state2, str(tmp_path / "nope"))
    assert begin0 == 0
