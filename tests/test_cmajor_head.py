"""Channel-major (NCHW) head emission: parameter-compatible with the NHWC
head, layout-only difference, and the voting layer accepts the channel-major
field end to end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.ops import select_kernel as SK
from pvnet_tpu.ops import voting
from pvnet_tpu import pipeline as pl_mod

from tests.test_voting import make_field, KPTS, BOX


class TestNCHWHead:
    def test_same_params_transposed_outputs(self):
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(1, 32, 32, 3), jnp.float32)
        m_nhwc = build_model("resnet18_8s", ver_dim=18)
        m_nchw = build_model("resnet18_8s", ver_dim=18, head_layout="NCHW")
        variables = m_nhwc.init(jax.random.PRNGKey(0), x, train=False)
        seg1, ver1 = m_nhwc.apply(variables, x, train=False)
        seg2, ver2 = m_nchw.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(seg2.transpose(0, 2, 3, 1)),
                                   np.asarray(seg1), rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ver2.transpose(0, 2, 3, 1)),
                                   np.asarray(ver1), rtol=1e-5, atol=1e-5)

    def test_predict_fields_both_layouts(self):
        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(2, 32, 32, 3), jnp.float32)
        m_nhwc = build_model("resnet18_8s", ver_dim=6)
        m_nchw = build_model("resnet18_8s", ver_dim=6, head_layout="NCHW")
        variables = m_nhwc.init(jax.random.PRNGKey(0), x, train=False)
        mask1, v1 = pl_mod.predict_fields(m_nhwc.apply, variables, x)
        mask2, v2 = pl_mod.predict_fields(m_nchw.apply, variables, x)
        np.testing.assert_array_equal(np.asarray(mask1), np.asarray(mask2))
        assert v1.shape == (2, 32, 32, 3, 2)
        assert v2.shape == (2, 6, 32, 32)
        np.testing.assert_allclose(
            np.asarray(v2.transpose(0, 2, 3, 1).reshape(2, 32, 32, 3, 2)),
            np.asarray(v1), rtol=1e-5, atol=1e-5)


class TestCmajorSelection:
    def test_cmajor_matches_nhwc_selection(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        vm = jnp.asarray(mask)[None]
        v5 = jnp.asarray(vertex)[None]                      # [1,h,w,3,2]
        vcm = jnp.asarray(vertex.reshape(128, 128, 6).transpose(2, 0, 1))[
            None]                                           # [1,6,h,w]
        key = jax.random.PRNGKey(0)
        fg1 = voting.sample_foreground(vm, v5, 256, key, method="stratified")
        fg2 = voting.sample_foreground(vm, vcm, 256, key, method="stratified")
        np.testing.assert_array_equal(np.asarray(fg1.coords),
                                      np.asarray(fg2.coords))
        np.testing.assert_allclose(np.asarray(fg1.dirs),
                                   np.asarray(fg2.dirs), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(fg1.valid),
                                      np.asarray(fg2.valid))

    @pytest.mark.parametrize("a,bb", [(8, 8), (4, 16), (4, 32)])
    def test_cmajor_kernel_interpret_matches_xla(self, a, bb):
        # the cmajor kernel competes on native 128-lane tiles: w % 128 == 0
        rng = np.random.RandomState(0)
        b, h, w, c = 2, 32, 256, 6
        score = jnp.asarray(rng.rand(b, h, w), jnp.float32)
        vertex = jnp.asarray(rng.randn(b, h, w, c), jnp.float32)
        vcm = jnp.transpose(vertex, (0, 3, 1, 2))
        with pltpu.force_tpu_interpret_mode():
            best, idx, dirs = SK.stratified_select_cmajor(score, vcm, a, bb)
        wb, wi, wd = SK.stratified_select_xla(score, vertex, a, bb)
        np.testing.assert_allclose(np.asarray(best), np.asarray(wb),
                                   rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), np.asarray(wi))
        np.testing.assert_allclose(np.asarray(dirs), np.asarray(wd),
                                   rtol=1e-6, atol=1e-6)

    def test_v3_voting_with_cmajor_field(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        vcm = jnp.asarray(vertex.reshape(128, 128, 6).transpose(2, 0, 1))[
            None]
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], vcm, jax.random.PRNGKey(0),
            hyp_num=256, max_num=256, impl="xla",
            select_method="stratified")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)

    def test_v3_voting_cmajor_topk_fallback(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        vcm = jnp.asarray(vertex.reshape(128, 128, 6).transpose(2, 0, 1))[
            None]
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], vcm, jax.random.PRNGKey(0),
            hyp_num=256, max_num=256, impl="xla", select_method="topk")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)


class TestCmajorPipeline:
    def test_pose_pipeline_nchw_head(self):
        """Full fused pipeline with the NCHW head compiles and runs."""
        rng = np.random.RandomState(0)
        m = build_model("resnet18_8s", ver_dim=18, head_layout="NCHW")
        img = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
        variables = m.init(jax.random.PRNGKey(0), img, train=False)
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        K = np.array([[100.0, 0, 32], [0, 100.0, 32], [0, 0, 1]], np.float32)
        run = pl_mod.make_pose_pipeline(
            m.apply, pts3d, K, params=pl_mod.VoteParams(hyp_num=64,
                                                        max_num=64))
        pose, kps = jax.jit(run)(variables, img, jax.random.PRNGKey(1))
        assert pose.shape == (1, 3, 4) and kps.shape == (1, 9, 2)
        assert np.isfinite(np.asarray(pose)).all()
