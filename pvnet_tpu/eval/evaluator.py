"""Accumulating pose evaluator (ref lib/utils/evaluation_utils.py:64-226).

Decoupled from the dataset layer: per-object metadata arrives as an
:class:`ObjectMeta` (keypoints, mesh points, diameter, symmetry flag) so the
evaluator works with LINEMOD, occlusion/truncation splits, or synthetic
fixtures alike. The per-image pipeline is

    voted 2D keypoints (+ covariance)  ->  PnP  ->  ADD(-S) / 2D-proj / 5cm5deg

with the PnP solve and all metric math in jitted JAX; only the accumulation
lists live on the host.
"""
from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.eval import metrics as M
from pvnet_tpu.ops.geometry import inv_sqrtm_2x2
from pvnet_tpu.ops.pnp import pnp as pnp_solve
from pvnet_tpu.ops.pnp import uncertainty_pnp as upnp_solve


@dataclass
class ObjectMeta:
    """Static per-class evaluation metadata.

    Attributes:
      points_3d:  [vn, 3] canonical 3D keypoints (FPS + center etc.,
                  ref VotingType.get_pts_3d, linemod_dataset.py:142-169).
      model_pts:  [n, 3] mesh vertices for ADD / projection metrics.
      diameter:   object diameter in meters (ref data_utils.py:111-118).
      symmetric:  use ADD-S (glue/eggbox, ref config.py:70).
      name:       class name (reporting only).
    """
    points_3d: np.ndarray
    model_pts: np.ndarray
    diameter: float
    symmetric: bool = False
    name: str = ""


def _uncertain_impl(points_3d, kps_2d, covar, K):
    W = inv_sqrtm_2x2(covar)
    bad = (covar[:, 0, 0] < 1e-6) | jnp.any(jnp.isnan(covar), axis=(1, 2))
    W = jnp.where(bad[:, None, None], 0.0, W)
    w3 = jnp.stack([W[:, 0, 0], W[:, 0, 1], W[:, 1, 1]], axis=-1)
    return upnp_solve(kps_2d, w3, points_3d, K)


@jax.jit
def _pose_from_keypoints(points_3d, kps_2d, K):
    return pnp_solve(points_3d, kps_2d, K)


@jax.jit
def _pose_from_keypoints_uncertain(points_3d, kps_2d, covar, K):
    return _uncertain_impl(points_3d, kps_2d, covar, K)


@jax.jit
def _metric_bundle(pose_pred, pose_gt, model_pts, K):
    add = M.add_error(pose_pred, pose_gt, model_pts)
    adds = M.add_error_sym(pose_pred, pose_gt, model_pts)
    proj = M.projection_error(pose_pred, pose_gt, model_pts, K)
    trans_cm, rot_deg = M.cm_degree_errors(pose_pred, pose_gt)
    return add, adds, proj, trans_cm, rot_deg


# Batched variants: one device call per batch/flush instead of one per
# image — each per-image call pays a full host<->device round trip, which
# dominates eval wall time on a remote-attached TPU.
_pose_batch = jax.jit(jax.vmap(pnp_solve, in_axes=(None, 0, 0)))
_pose_batch_uncertain = jax.jit(jax.vmap(_uncertain_impl,
                                         in_axes=(None, 0, 0, 0)))
_metric_batch = jax.jit(jax.vmap(_metric_bundle,
                                 in_axes=(0, 0, None, 0)))


class Evaluator:
    """Accumulates per-image pose metrics; thresholds as the reference
    (ADD < 0.1*diameter, proj < 5 px, 5 cm & 5 deg)."""

    # chunk size for deferred metric computation: bounds the [chunk, tile,
    # n_model_pts] distance tensors of the symmetric-ADD nearest-neighbor
    _FLUSH_CHUNK = 32

    def __init__(self, meta: ObjectMeta,
                 add_percentage: float = 0.1,
                 proj_threshold: float = 5.0):
        self.meta = meta
        self.add_percentage = add_percentage
        self.proj_threshold = proj_threshold
        self._projection_2d_recorder: List[bool] = []
        self._add_recorder: List[bool] = []
        self._cm_degree_5_recorder: List[bool] = []
        self._proj_mean_diffs: List[float] = []
        self._add_dists: List[float] = []
        self._pending: List[Tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._pts3d = jnp.asarray(meta.points_3d, jnp.float32)
        self._model = jnp.asarray(meta.model_pts, jnp.float32)

    # Metric lists are computed lazily in batches (one device call per
    # _FLUSH_CHUNK images); reading any of them flushes first.
    @property
    def projection_2d_recorder(self) -> List[bool]:
        self._flush()
        return self._projection_2d_recorder

    @property
    def add_recorder(self) -> List[bool]:
        self._flush()
        return self._add_recorder

    @property
    def cm_degree_5_recorder(self) -> List[bool]:
        self._flush()
        return self._cm_degree_5_recorder

    @property
    def proj_mean_diffs(self) -> List[float]:
        self._flush()
        return self._proj_mean_diffs

    @property
    def add_dists(self) -> List[float]:
        self._flush()
        return self._add_dists

    # -- pose estimation front-ends --------------------------------------
    def evaluate(self, kps_2d: np.ndarray, pose_gt: np.ndarray,
                 K: np.ndarray) -> np.ndarray:
        """Plain path (ref evaluation_utils.py:143-163)."""
        pose_pred = _pose_from_keypoints(self._pts3d,
                                         jnp.asarray(kps_2d, jnp.float32),
                                         jnp.asarray(K, jnp.float32))
        self._record(pose_pred, pose_gt, K)
        return np.asarray(pose_pred)

    def evaluate_uncertainty(self, mean_2d: np.ndarray, covar: np.ndarray,
                             pose_gt: np.ndarray, K: np.ndarray
                             ) -> np.ndarray:
        """Uncertainty path (ref evaluation_utils.py:165-201)."""
        pose_pred = _pose_from_keypoints_uncertain(
            self._pts3d, jnp.asarray(mean_2d, jnp.float32),
            jnp.asarray(covar, jnp.float32), jnp.asarray(K, jnp.float32))
        self._record(pose_pred, pose_gt, K)
        return np.asarray(pose_pred)

    def evaluate_pose(self, pose_pred: np.ndarray, pose_gt: np.ndarray,
                      K: np.ndarray) -> None:
        """Record metrics for an externally computed pose."""
        self._record(jnp.asarray(pose_pred, jnp.float32), pose_gt, K)

    # -- batched front-ends (one device call per batch) -------------------
    def evaluate_batch(self, kps_2d: np.ndarray, poses_gt: np.ndarray,
                       Ks: np.ndarray) -> np.ndarray:
        """Plain path over a whole batch: kps [b, vn, 2], poses_gt
        [b, 3, 4], Ks [b, 3, 3]. One jitted PnP solve for the batch."""
        poses = np.asarray(_pose_batch(
            self._pts3d, jnp.asarray(kps_2d, jnp.float32),
            jnp.asarray(Ks, jnp.float32)))
        for i in range(poses.shape[0]):
            self._record(poses[i], poses_gt[i], Ks[i])
        return poses

    def evaluate_uncertainty_batch(self, mean_2d: np.ndarray,
                                   covar: np.ndarray,
                                   poses_gt: np.ndarray,
                                   Ks: np.ndarray) -> np.ndarray:
        """Uncertainty path over a whole batch: covar [b, vn, 2, 2]."""
        poses = np.asarray(_pose_batch_uncertain(
            self._pts3d, jnp.asarray(mean_2d, jnp.float32),
            jnp.asarray(covar, jnp.float32), jnp.asarray(Ks, jnp.float32)))
        for i in range(poses.shape[0]):
            self._record(poses[i], poses_gt[i], Ks[i])
        return poses

    # -- internals --------------------------------------------------------
    def _record(self, pose_pred, pose_gt, K):
        self._pending.append((np.asarray(pose_pred, np.float32),
                              np.asarray(pose_gt, np.float32),
                              np.asarray(K, np.float32)))

    def _flush(self):
        while self._pending:
            chunk = self._pending[:self._FLUSH_CHUNK]
            self._pending = self._pending[self._FLUSH_CHUNK:]
            pp = jnp.asarray(np.stack([c[0] for c in chunk]))
            pg = jnp.asarray(np.stack([c[1] for c in chunk]))
            Ks = jnp.asarray(np.stack([c[2] for c in chunk]))
            add, adds, proj, trans_cm, rot_deg = (
                np.asarray(x) for x in _metric_batch(pp, pg, self._model,
                                                     Ks))
            use = adds if self.meta.symmetric else add
            for i in range(len(chunk)):
                add_val = float(use[i])
                self._add_dists.append(add_val)
                self._add_recorder.append(
                    add_val < self.meta.diameter * self.add_percentage)
                proj_val = float(proj[i])
                self._proj_mean_diffs.append(proj_val)
                self._projection_2d_recorder.append(
                    proj_val < self.proj_threshold)
                self._cm_degree_5_recorder.append(
                    float(trans_cm[i]) < 5.0 and float(rot_deg[i]) < 5.0)

    def save_proj_diffs(self, path: str = "tmp.npy") -> str:
        """Dump raw per-image mean projection errors, mirroring the
        reference's np.save('tmp.npy', ...) side effect
        (ref evaluation_utils.py:220)."""
        np.save(path, np.asarray(self.proj_mean_diffs, np.float64))
        return path

    def average_precision(self, verbose: bool = True
                          ) -> Tuple[float, float, float]:
        """(2D-proj rate, ADD rate, 5cm5deg rate)
        (ref evaluation_utils.py:219-226)."""
        self._flush()
        proj = float(np.mean(self._projection_2d_recorder)) \
            if self._projection_2d_recorder else float("nan")
        add = float(np.mean(self._add_recorder)) \
            if self._add_recorder else float("nan")
        cm = float(np.mean(self._cm_degree_5_recorder)) \
            if self._cm_degree_5_recorder else float("nan")
        if verbose:
            print(f"2d projections metric: {proj}")
            print(f"ADD metric: {add}")
            print(f"5 cm 5 degree metric: {cm}")
        return proj, add, cm
