"""Model tests: shape polymorphism (the reference's model_repository __main__
runs 50 random sizes in 256..480 step 8), dilation arithmetic, upsampling
parity with torch's align_corners bilinear, and train/eval mode behavior."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.models import pvnet as pvnet_mod
from pvnet_tpu.models.pvnet import PVNet, build_model, upsample_bilinear_align_corners
from pvnet_tpu.models.resnet import resnet18_backbone


class TestUpsample:
    def test_matches_torch_align_corners(self, rng):
        import torch
        x = rng.randn(2, 7, 9, 3).astype(np.float32)
        out = np.asarray(upsample_bilinear_align_corners(
            jnp.asarray(x), 14, 18))
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        expect = torch.nn.UpsamplingBilinear2d(scale_factor=2)(tx)
        expect = expect.permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(out, expect, rtol=1e-4, atol=1e-5)

    def test_identity_when_same_size(self, rng):
        x = rng.randn(1, 8, 8, 2).astype(np.float32)
        out = np.asarray(upsample_bilinear_align_corners(jnp.asarray(x), 8, 8))
        np.testing.assert_allclose(out, x, atol=1e-6)


class TestBackbone:
    def test_feature_strides(self, rng):
        model = resnet18_backbone()
        x = jnp.asarray(rng.randn(1, 64, 96, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        x2s, x4s, x8s, x16s, x32s = model.apply(variables, x, train=False)
        assert x2s.shape[1:3] == (32, 48)
        assert x4s.shape[1:3] == (16, 24)
        # output stride 8: everything from x8s on stays at stride 8
        assert x8s.shape[1:3] == (8, 12)
        assert x16s.shape[1:3] == (8, 12)
        assert x32s.shape[1:3] == (8, 12)
        assert x8s.shape[-1] == 128
        assert x16s.shape[-1] == 256
        assert x32s.shape[-1] == 512


class TestPVNet:
    def _init(self, model, shape):
        x = jnp.zeros(shape, jnp.float32)
        return model.init(jax.random.PRNGKey(0), x, train=False)

    def test_output_shapes(self, rng):
        model = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = self._init(model, (2, 64, 64, 3))
        seg, ver = model.apply(variables, x, train=False)
        assert seg.shape == (2, 64, 64, 2)
        assert ver.shape == (2, 64, 64, 18)
        assert seg.dtype == jnp.float32

    def test_shape_polymorphic(self, rng):
        """The FCN must run at any (h, w) multiple of 8
        (ref model_repository.py:334-343 smoke block)."""
        model = build_model("resnet18_8s", ver_dim=18)
        variables = self._init(model, (1, 64, 64, 3))
        for h, w in [(64, 64), (72, 88), (96, 64)]:
            x = jnp.asarray(rng.randn(1, h, w, 3).astype(np.float32))
            seg, ver = model.apply(variables, x, train=False)
            assert seg.shape == (1, h, w, 2)
            assert ver.shape == (1, h, w, 18)

    def test_train_mode_updates_batch_stats(self, rng):
        model = build_model("resnet18_8s", ver_dim=18)
        variables = self._init(model, (1, 64, 64, 3))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        (_, _), mutated = model.apply(variables, x, train=True,
                                      mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        assert any(not np.allclose(np.asarray(b), np.asarray(a))
                   for b, a in zip(before, after))

    def test_bf16_compute_f32_output(self, rng):
        model = build_model("resnet18_8s", ver_dim=18, dtype=jnp.bfloat16)
        variables = self._init(model, (1, 64, 64, 3))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        seg, ver = model.apply(variables, x, train=False)
        assert seg.dtype == jnp.float32 and ver.dtype == jnp.float32

    def test_resnet50_variant(self, rng):
        model = build_model("resnet50_8s", ver_dim=18)
        variables = self._init(model, (1, 64, 64, 3))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        seg, ver = model.apply(variables, x, train=False)
        assert seg.shape == (1, 64, 64, 2)

    def test_resnet50_2o_half_resolution_heads(self, rng):
        # ref Resnet50_8s_2o (model_repository.py:158-224): the decoder
        # stops at stride 2 and both heads emit at h/2 x w/2
        model = build_model("resnet50_8s_2o", ver_dim=18)
        variables = self._init(model, (1, 64, 64, 3))
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        seg, ver = model.apply(variables, x, train=False)
        assert seg.shape == (1, 32, 32, 2)
        assert ver.shape == (1, 32, 32, 18)
        assert seg.dtype == jnp.float32 and ver.dtype == jnp.float32

    def test_half_pixel_downsample_matches_pair_mean(self, rng):
        from pvnet_tpu.models.pvnet import downsample_bilinear_half
        x = jnp.asarray(rng.randn(2, 8, 12, 3).astype(np.float32))
        y = downsample_bilinear_half(x)
        ref = np.asarray(x).reshape(2, 4, 2, 6, 2, 3).mean(axis=(2, 4))
        np.testing.assert_allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-6)

    def test_unknown_network_raises(self):
        with pytest.raises(ValueError):
            build_model("vgg16", ver_dim=18)

    def test_param_count_resnet18(self):
        """~15M params like the reference Resnet18_8s (sanity envelope)."""
        model = build_model("resnet18_8s", ver_dim=18)
        variables = self._init(model, (1, 64, 64, 3))
        n = sum(np.prod(p.shape) for p in
                jax.tree_util.tree_leaves(variables["params"]))
        assert 10e6 < n < 20e6, n


class TestVGG16Convs:
    def test_output_shapes_and_pipeline_adapter(self, rng):
        import jax
        from pvnet_tpu.models.vgg import vgg16_convs, as_pvnet_outputs
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        model = vgg16_convs(ver_dim=16, seg_dim=2)
        v = model.init(jax.random.PRNGKey(0), x, train=False)
        seg_score, seg_pred, vertex_pred = model.apply(v, x, train=False)
        assert seg_score.shape == (1, 64, 64, 2)
        assert seg_pred.shape == (1, 64, 64, 2)
        assert vertex_pred.shape == (1, 64, 64, 16)
        np.testing.assert_allclose(np.asarray(seg_pred.sum(-1)), 1.0,
                                   atol=1e-5)
        seg, ver = as_pvnet_outputs((seg_score, seg_pred, vertex_pred))
        assert seg.shape == (1, 64, 64, 2) and ver.shape == (1, 64, 64, 16)

    def test_backbone_strides(self, rng):
        import jax
        from pvnet_tpu.models.vgg import VGG16Backbone
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        model = VGG16Backbone()
        v = model.init(jax.random.PRNGKey(0), x)
        c4, c5 = model.apply(v, x)
        assert c4.shape == (1, 8, 8, 512)    # stride 8
        assert c5.shape == (1, 4, 4, 512)    # stride 16
