"""PnP solver tests: random-pose projection round trips, the reference's own
validation strategy (its extend_utils.py __main__ perturbs GT keypoints with
known noise and checks weighted PnP beats unweighted; its uncertainty_pnp.cpp
main() checks Ceres recovers a synthesized pose)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu.ops import pnp as pnp_mod
from pvnet_tpu.ops import geometry as geo


@pytest.fixture(autouse=True)
def _clear_jax_caches_per_test():
    # This module compiles the largest per-test XLA-CPU programs in the
    # suite (multi-seed EPnP + multi-start LM under double vmap); on a
    # cold persistent cache the 12th in-process compile reliably
    # SEGFAULTS inside backend_compile (the documented accumulation
    # crash, reproduced deterministically 2026-08-20). Dropping the
    # in-memory executables after every test keeps the process under the
    # threshold; the persistent disk cache makes reloads cheap.
    yield
    jax.clear_caches()


def random_pose(rng, z=(0.4, 1.2)):
    w = rng.randn(3)
    w = w / np.linalg.norm(w) * rng.uniform(0, np.pi * 0.9)
    R = np.asarray(geo.rodrigues(jnp.asarray(w, jnp.float32)))
    t = np.array([rng.uniform(-0.15, 0.15), rng.uniform(-0.15, 0.15),
                  rng.uniform(*z)], np.float32)
    return np.concatenate([R, t[:, None]], 1).astype(np.float32)


def random_points(rng, n=9, scale=0.08):
    return (rng.uniform(-1, 1, (n, 3)) * scale).astype(np.float32)


def project_np(pts, pose, K):
    cam = pts @ pose[:, :3].T + pose[:, 3]
    uv = cam @ K.T
    return (uv[:, :2] / uv[:, 2:]).astype(np.float32)


def pose_errors(pred, gt):
    ang = float(geo.rotation_angle_deg(jnp.asarray(pred[:, :3]),
                                       jnp.asarray(gt[:, :3])))
    trans = float(np.linalg.norm(pred[:, 3] - gt[:, 3]))
    return ang, trans


class TestEPnP:
    def test_exact_recovery(self, rng):
        for trial in range(10):
            pose = random_pose(rng)
            pts3d = random_points(rng)
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            pred = np.asarray(pnp_mod.epnp(
                jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(LINEMOD_K)))
            ang, trans = pose_errors(pred, pose)
            assert ang < 1.0, (trial, ang)
            assert trans < 0.01, (trial, trans)

    def test_four_points(self, rng):
        pose = random_pose(rng)
        pts3d = random_points(rng, n=4)
        pts2d = project_np(pts3d, pose, LINEMOD_K)
        pred = np.asarray(pnp_mod.epnp(
            jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(LINEMOD_K)))
        ang, trans = pose_errors(pred, pose)
        assert ang < 3.0 and trans < 0.02

    def test_planar_points(self, rng):
        """Planar keypoint sets hit the classic pose ambiguity; the full
        solver (EPnP init + multi-start LM) must still reproject exactly."""
        for _ in range(6):
            pose = random_pose(rng)
            pts3d = random_points(rng, n=9)
            pts3d[:, 2] = 0.0  # planar configuration
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            pred = np.asarray(pnp_mod.pnp(
                jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(LINEMOD_K)))
            reproj = project_np(pts3d, pred, LINEMOD_K)
            assert np.abs(reproj - pts2d).mean() < 0.5


class TestPnP:
    def test_noisefree_roundtrip(self, rng):
        for _ in range(10):
            pose = random_pose(rng)
            pts3d = random_points(rng)
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            pred = np.asarray(pnp_mod.pnp(
                jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(LINEMOD_K)))
            ang, trans = pose_errors(pred, pose)
            assert ang < 0.1
            assert trans < 1e-3

    def test_noisy_still_close(self, rng):
        errs = []
        for _ in range(10):
            pose = random_pose(rng)
            pts3d = random_points(rng)
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            pts2d = pts2d + rng.randn(*pts2d.shape).astype(np.float32) * 1.0
            pred = np.asarray(pnp_mod.pnp(
                jnp.asarray(pts3d), jnp.asarray(pts2d), jnp.asarray(LINEMOD_K)))
            errs.append(pose_errors(pred, pose))
        angs = np.array([e[0] for e in errs])
        trans = np.array([e[1] for e in errs])
        assert np.median(angs) < 5.0
        assert np.median(trans) < 0.05

    def test_jit_and_batch(self, rng):
        pose1, pose2 = random_pose(rng), random_pose(rng)
        pts3d = random_points(rng)
        pts2d = np.stack([project_np(pts3d, pose1, LINEMOD_K),
                          project_np(pts3d, pose2, LINEMOD_K)])
        f = jax.jit(pnp_mod.pnp_batch)
        preds = np.asarray(f(jnp.asarray(pts3d), jnp.asarray(pts2d),
                             jnp.asarray(LINEMOD_K)))
        for pred, gt in zip(preds, [pose1, pose2]):
            ang, trans = pose_errors(pred, gt)
            assert ang < 0.5 and trans < 5e-3


class TestUncertaintyPnP:
    def test_weighted_beats_unweighted(self, rng):
        """Mirror of the reference's accuracy check
        (ref extend_utils.py:236-288): heteroscedastic noise with known
        scale; inverse-scale weights must improve pose accuracy."""
        wins = 0
        trials = 12
        for _ in range(trials):
            pose = random_pose(rng)
            pts3d = random_points(rng, n=9)
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            w3 = np.zeros((9, 3), np.float32)
            noisy = pts2d.copy()
            for k in range(9):
                scale = rng.uniform(1, 8) if rng.rand() < 0.5 else \
                    rng.uniform(32, 48)
                noisy[k] += rng.randn(2) * scale
                w3[k, 0] = w3[k, 2] = 1.0 / scale
            w3 /= w3.max()
            pred_w = np.asarray(pnp_mod.uncertainty_pnp(
                jnp.asarray(noisy), jnp.asarray(w3), jnp.asarray(pts3d),
                jnp.asarray(LINEMOD_K)))
            pred_u = np.asarray(pnp_mod.pnp(
                jnp.asarray(pts3d), jnp.asarray(noisy), jnp.asarray(LINEMOD_K)))
            err_w = np.mean(np.abs(project_np(pts3d, pred_w, LINEMOD_K) - pts2d))
            err_u = np.mean(np.abs(project_np(pts3d, pred_u, LINEMOD_K) - pts2d))
            wins += err_w < err_u
        assert wins >= trials * 2 // 3, f"weighted won only {wins}/{trials}"

    def test_zero_weight_points_ignored(self, rng):
        pose = random_pose(rng)
        pts3d = random_points(rng, n=9)
        pts2d = project_np(pts3d, pose, LINEMOD_K)
        corrupted = pts2d.copy()
        corrupted[0] += 300.0  # wildly wrong, but zero weight
        w3 = np.ones((9, 3), np.float32)
        w3[:, 1] = 0.0
        w3[0] = 0.0
        pred = np.asarray(pnp_mod.uncertainty_pnp(
            jnp.asarray(corrupted), jnp.asarray(w3), jnp.asarray(pts3d),
            jnp.asarray(LINEMOD_K)))
        ang, trans = pose_errors(pred, pose)
        assert ang < 0.5 and trans < 5e-3

    def test_v2_covariance_input(self, rng):
        pose = random_pose(rng)
        pts3d = random_points(rng, n=9)
        pts2d = project_np(pts3d, pose, LINEMOD_K)
        covars = np.tile(np.eye(2, dtype=np.float32) * 4.0, (9, 1, 1))
        pred = np.asarray(pnp_mod.uncertainty_pnp_v2(
            jnp.asarray(pts2d), jnp.asarray(covars), jnp.asarray(pts3d),
            jnp.asarray(LINEMOD_K)))
        ang, trans = pose_errors(pred, pose)
        assert ang < 0.5 and trans < 5e-3

    def test_full_weight_matrix_off_diagonal(self, rng):
        """Anisotropic correlated noise: full 2x2 weights must help."""
        pose = random_pose(rng)
        pts3d = random_points(rng, n=9)
        pts2d = project_np(pts3d, pose, LINEMOD_K)
        # noise along a fixed direction
        direction = np.array([0.8, 0.6], np.float32)
        noise = rng.randn(9, 1).astype(np.float32) * 6.0 * direction
        noisy = pts2d + noise
        cov = 36.0 * np.outer(direction, direction) + 0.25 * np.eye(2)
        w = np.asarray(geo.inv_sqrtm_2x2(jnp.asarray(
            np.tile(cov[None], (9, 1, 1)).astype(np.float32))))
        w3 = np.stack([w[:, 0, 0], w[:, 0, 1], w[:, 1, 1]], -1)
        pred = np.asarray(pnp_mod.uncertainty_pnp(
            jnp.asarray(noisy), jnp.asarray(w3), jnp.asarray(pts3d),
            jnp.asarray(LINEMOD_K)))
        ang, trans = pose_errors(pred, pose)
        assert trans < 0.05


class TestOpenCVParity:
    """Golden parity against the reference's actual solver (cv2.solvePnP),
    available in this environment."""

    def test_matches_cv2_iterative(self, rng):
        import cv2
        for _ in range(8):
            pose = random_pose(rng)
            pts3d = random_points(rng, n=9)
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            noisy = pts2d + rng.randn(*pts2d.shape).astype(np.float32) * 0.5
            _, rvec, tvec = cv2.solvePnP(
                pts3d.astype(np.float64), noisy.astype(np.float64),
                LINEMOD_K.astype(np.float64),
                np.zeros((8, 1)), flags=cv2.SOLVEPNP_ITERATIVE)
            R_cv, _ = cv2.Rodrigues(rvec)
            pose_cv = np.concatenate([R_cv, tvec], 1).astype(np.float32)
            pose_jx = np.asarray(pnp_mod.pnp(
                jnp.asarray(pts3d), jnp.asarray(noisy),
                jnp.asarray(LINEMOD_K)))
            ang, trans = pose_errors(pose_jx, pose_cv)
            assert ang < 0.5, ang
            assert trans < 5e-3, trans

    def test_epnp_matches_cv2_epnp(self, rng):
        import cv2
        angs = []
        for _ in range(8):
            pose = random_pose(rng)
            pts3d = random_points(rng, n=9)
            pts2d = project_np(pts3d, pose, LINEMOD_K)
            _, rvec, tvec = cv2.solvePnP(
                pts3d.astype(np.float64)[:, None],
                pts2d.astype(np.float64)[:, None],
                LINEMOD_K.astype(np.float64),
                np.zeros((8, 1)), flags=cv2.SOLVEPNP_EPNP)
            R_cv, _ = cv2.Rodrigues(rvec)
            pose_cv = np.concatenate([R_cv, tvec], 1).astype(np.float32)
            pose_jx = np.asarray(pnp_mod.epnp(
                jnp.asarray(pts3d), jnp.asarray(pts2d),
                jnp.asarray(LINEMOD_K)))
            ang, _ = pose_errors(pose_jx, pose_cv)
            angs.append(ang)
        assert np.median(angs) < 1.0, angs
