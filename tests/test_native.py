"""Native C++ kernel parity vs numpy fallbacks (skipped if not built)."""
import numpy as np
import pytest

from pvnet_tpu import native

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native lib not built "
                                       "(make -C pvnet_tpu/native)")


def test_fps_parity(rng):
    from pvnet_tpu.ops.fps import _fps_numpy
    pts = rng.randn(2000, 3).astype(np.float32)
    for init_center in (True, False):
        a = native.farthest_point_sampling(pts, 8, init_center)
        b = _fps_numpy(pts, 8, init_center)
        np.testing.assert_allclose(a, b)


def test_nn_parity(rng):
    ref = rng.randn(500, 3).astype(np.float32)
    que = rng.randn(40, 3).astype(np.float32)
    idx = native.find_nearest_point_idx(ref, que)
    expect = np.argmin(((que[:, None] - ref[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(idx, expect)


def test_nn_2d(rng):
    ref = rng.randn(300, 2).astype(np.float32)
    que = rng.randn(25, 2).astype(np.float32)
    idx = native.find_nearest_point_idx(ref, que)
    expect = np.argmin(((que[:, None] - ref[None]) ** 2).sum(-1), axis=1)
    np.testing.assert_array_equal(idx, expect)


def test_rasterizer_parity(rng):
    from pvnet_tpu.ops.rasterize import _rasterize
    tris = rng.uniform(0, 60, (20, 3, 2)).astype(np.float32)
    m1 = native.mesh_binary_rasterization(tris, 64, 64)
    m2 = np.zeros((64, 64), np.uint8)
    _rasterize(tris, None, 64, 64, mask_out=m2)
    np.testing.assert_array_equal(m1, m2)
    assert m1.sum() > 0
