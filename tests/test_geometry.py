import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.ops import geometry as geo


def random_pose(rng):
    w = rng.randn(3) * 0.8
    theta = np.linalg.norm(w)
    K_hat = np.array([[0, -w[2], w[1]], [w[2], 0, -w[0]], [-w[1], w[0], 0]])
    if theta < 1e-8:
        R = np.eye(3)
    else:
        K_hat = K_hat / theta
        R = (np.eye(3) + np.sin(theta) * K_hat
             + (1 - np.cos(theta)) * K_hat @ K_hat)
    t = np.array([rng.uniform(-0.1, 0.1), rng.uniform(-0.1, 0.1),
                  rng.uniform(0.4, 1.2)])
    return np.concatenate([R, t[:, None]], axis=1).astype(np.float32)


def test_project_matches_numpy(rng):
    K = np.array([[572.4114, 0, 325.2611], [0, 573.57043, 242.04899],
                  [0, 0, 1]], np.float32)
    pts = rng.uniform(-0.1, 0.1, (20, 3)).astype(np.float32)
    pose = random_pose(rng)
    # reference math (ref base_utils.py:project_K)
    cam = pts @ pose[:, :3].T + pose[:, 3]
    uv_np = (cam @ K.T)
    uv_np = uv_np[:, :2] / uv_np[:, 2:]
    uv = geo.project(jnp.asarray(pts), jnp.asarray(pose), jnp.asarray(K))
    np.testing.assert_allclose(np.asarray(uv), uv_np, rtol=1e-4, atol=1e-3)


def test_rodrigues_roundtrip(rng):
    ws = np.concatenate([
        rng.randn(50, 3),
        np.zeros((1, 3)),
        np.array([[np.pi - 1e-4, 0, 0]]),
        rng.randn(10, 3) * 1e-7,
    ]).astype(np.float32)
    R = geo.rodrigues(jnp.asarray(ws))
    # orthonormality
    eye = jnp.einsum("...ij,...kj->...ik", R, R)
    np.testing.assert_allclose(np.asarray(eye),
                               np.broadcast_to(np.eye(3), eye.shape),
                               atol=1e-5)
    w_back = geo.inverse_rodrigues(R)
    R2 = geo.rodrigues(w_back)
    np.testing.assert_allclose(np.asarray(R), np.asarray(R2), atol=1e-5)


def test_rotation_angle(rng):
    w = np.array([0.3, 0.0, 0.0], np.float32)
    R1 = geo.rodrigues(jnp.asarray(w))
    R2 = geo.rodrigues(jnp.zeros(3, jnp.float32))
    ang = geo.rotation_angle_deg(R1, R2)
    np.testing.assert_allclose(float(ang), np.rad2deg(0.3), rtol=1e-4)


def test_inv_sqrtm_2x2(rng):
    import scipy.linalg
    for _ in range(20):
        A = rng.randn(2, 2)
        S = (A @ A.T + 0.1 * np.eye(2)).astype(np.float32)
        out = np.asarray(geo.inv_sqrtm_2x2(jnp.asarray(S)))
        expect = np.linalg.inv(scipy.linalg.sqrtm(S)).real
        np.testing.assert_allclose(out, expect, rtol=1e-3, atol=1e-4)


def test_inv_sqrtm_2x2_diagonal():
    S = jnp.asarray(np.diag([4.0, 9.0]).astype(np.float32))
    out = np.asarray(geo.inv_sqrtm_2x2(S))
    np.testing.assert_allclose(out, np.diag([0.5, 1.0 / 3.0]), rtol=1e-5)


def test_solve_2x2(rng):
    A = rng.randn(7, 2, 2).astype(np.float32)
    A = A @ np.transpose(A, (0, 2, 1)) + 0.5 * np.eye(2, dtype=np.float32)
    b = rng.randn(7, 2).astype(np.float32)
    x = np.asarray(geo.solve_2x2(jnp.asarray(A), jnp.asarray(b)))
    expect = np.linalg.solve(A, b[..., None])[..., 0]
    np.testing.assert_allclose(x, expect, rtol=1e-3, atol=1e-4)


def test_solve_2x2_singular():
    A = jnp.zeros((2, 2))
    x = geo.solve_2x2(A, jnp.ones(2))
    np.testing.assert_allclose(np.asarray(x), np.zeros(2))


def test_find_nearest_point_distance(rng):
    ref = rng.randn(500, 3).astype(np.float32)
    que = rng.randn(40, 3).astype(np.float32)
    d = np.asarray(geo.find_nearest_point_distance(jnp.asarray(ref),
                                                   jnp.asarray(que)))
    expect = np.sqrt(((que[:, None] - ref[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(d, expect, rtol=1e-4, atol=1e-5)


def test_find_nearest_point_distance_tiled(rng):
    ref = rng.randn(5000, 3).astype(np.float32)
    que = rng.randn(17, 3).astype(np.float32)
    d = np.asarray(geo.find_nearest_point_distance(
        jnp.asarray(ref), jnp.asarray(que), tile=1024))
    expect = np.sqrt(((que[:, None] - ref[None]) ** 2).sum(-1)).min(1)
    np.testing.assert_allclose(d, expect, rtol=1e-4, atol=1e-5)


class TestDepthBackprojection:
    def test_roundtrip_project(self):
        from pvnet_tpu.data.pose_transforms import mask_depth_to_pts
        K = np.array([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1]],
                     np.float32)
        rng = np.random.RandomState(0)
        depth = rng.uniform(0.5, 2.0, (48, 64)).astype(np.float32)
        mask = np.zeros((48, 64), bool)
        mask[10:30, 20:50] = True
        pts, pts_2d = mask_depth_to_pts(mask, depth, K, output_2d=True)
        assert pts.shape == (20 * 30, 3)
        # reproject: x = K @ p / z must give back the pixel coords
        proj = pts @ K.T
        proj = proj[:, :2] / proj[:, 2:]
        np.testing.assert_allclose(proj, pts_2d, atol=1e-3)
        np.testing.assert_allclose(pts[:, 2], depth[mask], atol=1e-5)


class TestSolveSPDSmall:
    def test_matches_linalg_solve(self):
        from pvnet_tpu.ops.geometry import solve_spd_small
        rng = np.random.RandomState(0)
        for n in (2, 4, 6):
            M = rng.randn(64, n, n).astype(np.float32)
            A = (M @ M.transpose(0, 2, 1)
                 + n * np.eye(n, dtype=np.float32))
            b = rng.randn(64, n).astype(np.float32)
            got = np.asarray(
                jax.vmap(solve_spd_small)(jnp.asarray(A), jnp.asarray(b)))
            ref = np.linalg.solve(A.astype(np.float64),
                                  b[..., None].astype(np.float64))[..., 0]
            np.testing.assert_allclose(got, ref, rtol=2e-3, atol=1e-4)

    def test_near_rank_deficient_stays_finite(self):
        """The f32 planar-EPnP regime: huge-condition normal matrix with a
        tiny ridge must yield a finite (bounded) step, not NaN overflow."""
        from pvnet_tpu.ops.geometry import solve_spd_small
        rng = np.random.RandomState(1)
        J = rng.randn(6, 2).astype(np.float32) * 300.0   # rank 2 of 6
        A = J @ J.T + 1e-9 * np.eye(6, dtype=np.float32)
        b = (J @ rng.randn(2)).astype(np.float32)
        x = np.asarray(solve_spd_small(jnp.asarray(A), jnp.asarray(b)))
        assert np.isfinite(x).all()
