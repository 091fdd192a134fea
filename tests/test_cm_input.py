"""Channel-major (NCHW) image-input path: the on-device augmentation can
emit [b, 3, h, w] and the model can consume it directly (resnet.Conv
cm_input / cm_split), with parameters identical to the NHWC-input model —
so no [b, h, w, 3] tensor (42x lane-padded in HBM) is materialized between
augmentation and conv1 inside the jitted train step."""
import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.config import AugConfig, TrainConfig
from pvnet_tpu.data import augment_device as AD
from pvnet_tpu.models.pvnet import build_model


def _scene(b=2, h=64, w=96, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 256, (b, h, w, 3)).astype(np.uint8)
    mask = np.zeros((b, h, w), np.int32)
    mask[:, 20:40, 30:60] = 1
    hc = np.concatenate([rng.rand(b, 9, 1) * w, rng.rand(b, 9, 1) * h,
                         np.ones((b, 9, 1))], axis=-1).astype(np.float32)
    return jnp.asarray(img), jnp.asarray(mask), jnp.asarray(hc)


class TestAugmentCMOut:
    def test_out_layout_transpose_parity(self):
        """Same key => identical draws; the NCHW emission is exactly the
        transpose of the NHWC one (warp/flip/blur/jitter/normalize all
        run layout-parametrically on the same values)."""
        img, mask, hc = _scene()
        cfg = AugConfig()
        key = jax.random.PRNGKey(3)
        a_img, a_mask, a_hc = AD.augment_batch(img, mask, hc, key,
                                               (64, 96), cfg)
        b_img, b_mask, b_hc = AD.augment_batch(img, mask, hc, key,
                                               (64, 96), cfg,
                                               out_layout="NCHW")
        assert b_img.shape == (2, 3, 64, 96)
        np.testing.assert_allclose(np.asarray(b_img.transpose(0, 2, 3, 1)),
                                   np.asarray(a_img), rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(a_mask),
                                      np.asarray(b_mask))
        np.testing.assert_allclose(np.asarray(a_hc), np.asarray(b_hc),
                                   rtol=1e-6)

    def test_out_layout_no_geometry(self):
        """crop/rotation off exercises the transpose-at-entry path."""
        img, mask, hc = _scene(seed=1)
        cfg = AugConfig(rotation=False, crop=False, flip=True, blur=True,
                        jitter=True)
        key = jax.random.PRNGKey(5)
        a_img, _, _ = AD.augment_batch(img, mask, hc, key, (64, 96), cfg)
        b_img, _, _ = AD.augment_batch(img, mask, hc, key, (64, 96), cfg,
                                       out_layout="NCHW")
        np.testing.assert_allclose(np.asarray(b_img.transpose(0, 2, 3, 1)),
                                   np.asarray(a_img), rtol=1e-5, atol=1e-5)


class TestModelCMInput:
    def test_same_params_same_outputs(self):
        """The NCHW-input model shares the param tree with the NHWC one
        (resnet.Conv auto-names as Conv_0; the split raw conv keeps the
        single Conv_4 kernel) and computes the same function."""
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 32, 48, 3), jnp.float32)
        x_cm = jnp.transpose(x, (0, 3, 1, 2))
        m = build_model("resnet18_8s", ver_dim=18)
        m_cm = build_model("resnet18_8s", ver_dim=18, input_layout="NCHW")
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        v_cm = m_cm.init(jax.random.PRNGKey(0), x_cm, train=False)
        t1 = jax.tree_util.tree_structure(variables)
        t2 = jax.tree_util.tree_structure(v_cm)
        assert t1 == t2, (t1, t2)
        for a, b in zip(jax.tree_util.tree_leaves(variables),
                        jax.tree_util.tree_leaves(v_cm)):
            assert a.shape == b.shape
        seg1, ver1 = m.apply(variables, x, train=False)
        seg2, ver2 = m_cm.apply(variables, x_cm, train=False)
        np.testing.assert_allclose(np.asarray(seg2), np.asarray(seg1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ver2), np.asarray(ver1),
                                   rtol=1e-4, atol=1e-4)

    def test_cm_input_nchw_head(self):
        """Both channel-major ends at once (the production TPU training
        configuration)."""
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
        m = build_model("resnet18_8s", ver_dim=6, head_layout="NCHW")
        m2 = build_model("resnet18_8s", ver_dim=6, head_layout="NCHW",
                         input_layout="NCHW")
        variables = m.init(jax.random.PRNGKey(0), x, train=False)
        seg1, ver1 = m.apply(variables, x, train=False)
        seg2, ver2 = m2.apply(variables, jnp.transpose(x, (0, 3, 1, 2)),
                              train=False)
        assert seg2.shape == (2, 2, 32, 32) and ver2.shape == (2, 6, 32, 32)
        np.testing.assert_allclose(np.asarray(seg2), np.asarray(seg1),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(ver2), np.asarray(ver1),
                                   rtol=1e-4, atol=1e-4)


class TestTrainStepCMInput:
    def test_full_cm_step_matches_nhwc(self):
        """train_step with input_layout='NCHW' (cm aug emission + cm-input
        model) produces the same loss/metrics as the NHWC layouts."""
        from pvnet_tpu.train import trainer

        img, mask, hc = _scene(b=2, h=64, w=64, seed=2)
        batch = {"image": img, "mask": mask.astype(jnp.uint8),
                 "hcoords": hc}
        cfg = TrainConfig(model_name="t", train_batch_size=2)
        key = jax.random.PRNGKey(0)
        rng = jax.random.PRNGKey(9)

        m = build_model("resnet18_8s", ver_dim=18)
        state = trainer.create_train_state(m, cfg, (1, 64, 64, 3), key)
        _, met1 = jax.jit(lambda s, b: trainer.train_step(
            s, b, rng, aug_cfg=cfg.aug_cfg, aug_hw=(64, 64)))(state, batch)

        m2 = build_model("resnet18_8s", ver_dim=18, head_layout="NCHW",
                         input_layout="NCHW")
        state2 = trainer.create_train_state(m2, cfg, (1, 3, 64, 64), key)
        state2 = state2.replace(params=state.params,
                                batch_stats=state.batch_stats,
                                opt_state=state.opt_state)
        _, met2 = jax.jit(lambda s, b: trainer.train_step(
            s, b, rng, aug_cfg=cfg.aug_cfg, aug_hw=(64, 64),
            head_layout="NCHW", input_layout="NCHW"))(state2, batch)

        for k in ("loss", "seg_loss", "ver_loss"):
            np.testing.assert_allclose(float(met1[k]), float(met2[k]),
                                       rtol=2e-4, atol=2e-5)
