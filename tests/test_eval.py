"""Evaluation metric tests: analytic cases + full evaluator flow on the real
reference demo data (cat mask/pose/keypoints)."""
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu.eval import metrics as M
from pvnet_tpu.eval.evaluator import Evaluator, ObjectMeta
from pvnet_tpu.ops import geometry as geo


def pose_of(R, t):
    return np.concatenate([R, np.asarray(t, np.float32)[:, None]], 1)


IDENT = np.eye(3, dtype=np.float32)


class TestMetrics:
    def test_add_pure_translation(self, rng):
        pts = rng.randn(50, 3).astype(np.float32) * 0.05
        p1 = pose_of(IDENT, [0, 0, 0.5])
        p2 = pose_of(IDENT, [0.03, 0, 0.5])
        add = float(M.add_error(jnp.asarray(p1), jnp.asarray(p2),
                                jnp.asarray(pts)))
        assert add == pytest.approx(0.03, rel=1e-4)

    def test_add_sym_rotation_invariance(self):
        """A ring of points rotated about its symmetry axis: ADD large,
        ADD-S ~ 0 — the reason glue/eggbox use ADD-S."""
        n = 256
        ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
        ring = np.stack([np.cos(ang) * 0.05, np.sin(ang) * 0.05,
                         np.zeros_like(ang)], -1).astype(np.float32)
        # rotate by exactly 8 point spacings: the rotated ring coincides
        # with itself, so ADD-S ~ 0 while ADD sees the 8-step shift
        Rz = np.asarray(geo.rodrigues(
            jnp.asarray([0, 0, 8 * 2 * np.pi / n], jnp.float32)))
        p1 = pose_of(IDENT, [0, 0, 0.5])
        p2 = pose_of(Rz.astype(np.float32), [0, 0, 0.5])
        add = float(M.add_error(jnp.asarray(p1), jnp.asarray(p2),
                                jnp.asarray(ring)))
        adds = float(M.add_error_sym(jnp.asarray(p1), jnp.asarray(p2),
                                     jnp.asarray(ring)))
        assert add > 1e-3
        assert adds < add * 0.2

    def test_cm_degree(self):
        R = np.asarray(geo.rodrigues(jnp.asarray([0.1, 0, 0], jnp.float32)))
        p1 = pose_of(IDENT, [0, 0, 0.5])
        p2 = pose_of(R.astype(np.float32), [0.02, 0, 0.5])
        cm, deg = M.cm_degree_errors(jnp.asarray(p2), jnp.asarray(p1))
        assert float(cm) == pytest.approx(2.0, rel=1e-3)
        assert float(deg) == pytest.approx(np.rad2deg(0.1), rel=1e-3)

    def test_projection_error_zero_same_pose(self, rng):
        pts = rng.randn(20, 3).astype(np.float32) * 0.05
        p = pose_of(IDENT, [0, 0, 0.5])
        err = float(M.projection_error(jnp.asarray(p), jnp.asarray(p),
                                       jnp.asarray(pts),
                                       jnp.asarray(LINEMOD_K)))
        assert err < 1e-4


class TestEvaluator:
    def _demo_meta(self):
        pts3d = np.loadtxt(
            "/root/reference/data/demo/cat_points_3d.txt").astype(np.float32)
        # use the keypoints themselves as a stand-in mesh; diameter from
        # their extent
        d = float(np.linalg.norm(
            pts3d[None] - pts3d[:, None], axis=-1).max())
        return ObjectMeta(points_3d=pts3d, model_pts=pts3d, diameter=d,
                          symmetric=False, name="cat")

    def test_perfect_keypoints_score_100(self):
        meta = self._demo_meta()
        pose_gt = np.load(
            "/root/reference/data/demo/cat_pose.npy").astype(np.float32)
        cam = meta.points_3d @ pose_gt[:, :3].T + pose_gt[:, 3]
        uv = cam @ LINEMOD_K.T
        kps = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
        ev = Evaluator(meta)
        pose_pred = ev.evaluate(kps, pose_gt, LINEMOD_K)
        proj, add, cm = ev.average_precision(verbose=False)
        assert (proj, add, cm) == (1.0, 1.0, 1.0)
        ang = float(geo.rotation_angle_deg(jnp.asarray(pose_pred[:, :3]),
                                           jnp.asarray(pose_gt[:, :3])))
        assert ang < 0.1

    def test_noisy_keypoints_partial_scores(self, rng):
        meta = self._demo_meta()
        pose_gt = np.load(
            "/root/reference/data/demo/cat_pose.npy").astype(np.float32)
        cam = meta.points_3d @ pose_gt[:, :3].T + pose_gt[:, 3]
        uv = cam @ LINEMOD_K.T
        kps = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
        ev = Evaluator(meta)
        for i in range(10):
            noise = rng.randn(*kps.shape).astype(np.float32) * 2.0
            ev.evaluate(kps + noise, pose_gt, LINEMOD_K)
        proj, add, cm = ev.average_precision(verbose=False)
        assert 0.0 <= proj <= 1.0 and 0.0 <= add <= 1.0
        assert len(ev.add_dists) == 10

    def test_uncertainty_path_runs(self, rng):
        meta = self._demo_meta()
        pose_gt = np.load(
            "/root/reference/data/demo/cat_pose.npy").astype(np.float32)
        cam = meta.points_3d @ pose_gt[:, :3].T + pose_gt[:, 3]
        uv = cam @ LINEMOD_K.T
        kps = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
        covar = np.tile(np.eye(2, dtype=np.float32)[None], (9, 1, 1))
        covar[0] = 0.0  # degenerate keypoint -> zero weight path
        ev = Evaluator(meta)
        ev.evaluate_uncertainty(kps, covar, pose_gt, LINEMOD_K)
        proj, add, cm = ev.average_precision(verbose=False)
        assert add == 1.0

    def test_symmetric_class_uses_adds(self):
        ang = np.linspace(0, 2 * np.pi, 32, endpoint=False)
        ring = np.stack([np.cos(ang) * 0.05, np.sin(ang) * 0.05,
                         np.zeros_like(ang)], -1).astype(np.float32)
        meta = ObjectMeta(points_3d=ring[:9], model_pts=ring, diameter=0.1,
                          symmetric=True, name="ringthing")
        Rz = np.asarray(geo.rodrigues(
            jnp.asarray([0, 0, 2 * 2 * np.pi / 32],
                        jnp.float32))).astype(np.float32)
        pose_gt = pose_of(IDENT, [0, 0, 0.5])
        pose_rot = pose_of(Rz, [0, 0, 0.5])
        ev = Evaluator(meta)
        ev.evaluate_pose(pose_rot, pose_gt, LINEMOD_K)
        assert ev.add_recorder == [True]      # symmetric: ADD-S passes
        ev2 = Evaluator(ObjectMeta(ring[:9], ring, 0.1, False))
        ev2.evaluate_pose(pose_rot, pose_gt, LINEMOD_K)
        assert ev2.add_dists[0] > ev.add_dists[0]


class TestBatchedEvaluator:
    def _setup(self, rng, n=6):
        pts3d = np.loadtxt(
            "/root/reference/data/demo/cat_points_3d.txt").astype(np.float32)
        d = float(np.linalg.norm(
            pts3d[None] - pts3d[:, None], axis=-1).max())
        meta = ObjectMeta(points_3d=pts3d, model_pts=pts3d, diameter=d,
                          symmetric=False, name="cat")
        pose_gt = np.load(
            "/root/reference/data/demo/cat_pose.npy").astype(np.float32)
        cam = pts3d @ pose_gt[:, :3].T + pose_gt[:, 3]
        uv = cam @ LINEMOD_K.T
        kps = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
        kps_batch = np.stack(
            [kps + rng.randn(*kps.shape).astype(np.float32) * (i % 3)
             for i in range(n)])
        poses_gt = np.stack([pose_gt] * n)
        Ks = np.stack([LINEMOD_K] * n)
        return meta, kps_batch, poses_gt, Ks

    def test_batch_matches_per_image(self, rng):
        meta, kps, poses_gt, Ks = self._setup(rng)
        ev_b = Evaluator(meta)
        poses_b = ev_b.evaluate_batch(kps, poses_gt, Ks)
        ev_s = Evaluator(meta)
        for i in range(kps.shape[0]):
            ev_s.evaluate(kps[i], poses_gt[i], Ks[i])
        np.testing.assert_allclose(ev_b.proj_mean_diffs,
                                   ev_s.proj_mean_diffs, rtol=1e-3,
                                   atol=1e-3)
        assert ev_b.add_recorder == ev_s.add_recorder
        assert ev_b.cm_degree_5_recorder == ev_s.cm_degree_5_recorder
        assert poses_b.shape == (kps.shape[0], 3, 4)

    def test_uncertainty_batch_matches_per_image(self, rng):
        meta, kps, poses_gt, Ks = self._setup(rng, n=4)
        covar = np.tile(np.eye(2, dtype=np.float32)[None, None],
                        (4, kps.shape[1], 1, 1))
        covar[:, 0] = 0.0   # degenerate keypoint path
        ev_b = Evaluator(meta)
        ev_b.evaluate_uncertainty_batch(kps, covar, poses_gt, Ks)
        ev_s = Evaluator(meta)
        for i in range(4):
            ev_s.evaluate_uncertainty(kps[i], covar[i], poses_gt[i], Ks[i])
        np.testing.assert_allclose(ev_b.proj_mean_diffs,
                                   ev_s.proj_mean_diffs, rtol=1e-3,
                                   atol=1e-3)

    def test_flush_chunking(self, rng):
        meta, kps, poses_gt, Ks = self._setup(rng, n=3)
        ev = Evaluator(meta)
        # force multi-chunk flushing
        ev._FLUSH_CHUNK = 2
        for _ in range(3):
            ev.evaluate_batch(kps, poses_gt, Ks)     # 9 records, chunk 2
        assert len(ev.add_recorder) == 9
        assert len(ev._pending) == 0
