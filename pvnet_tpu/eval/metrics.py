"""Pose-quality metrics in pure JAX (batched, jittable).

Thresholds and formulas match the reference exactly
(ref lib/utils/evaluation_utils.py):
- ADD:   mean 3D distance of transformed model points; correct if
         < 0.1 * diameter (ref :91-117).
- ADD-S: nearest-neighbor variant for symmetric classes glue/eggbox
         (ref :119-130, selection :155-158), NN via the tiled jnp kernel
         replacing the reference's CUDA brute force.
- 2D-projection: mean reprojection distance < 5 px (ref :75-89).
- 5cm5deg: translation < 5 cm AND geodesic rotation < 5 deg (ref :132-141).
"""
from __future__ import annotations

import jax.numpy as jnp

from pvnet_tpu.ops.geometry import (find_nearest_point_distance, project,
                                    rotation_angle_deg, transform_points)


def add_error(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray,
              model_pts: jnp.ndarray) -> jnp.ndarray:
    """Mean 3D distance between corresponding transformed model points.

    Args:
      pose_pred/pose_gt: [..., 3, 4]; model_pts: [n, 3].
    Returns scalar (or batched) mean distance in model units (meters).
    """
    p = transform_points(model_pts, pose_pred)
    g = transform_points(model_pts, pose_gt)
    return jnp.mean(jnp.linalg.norm(p - g, axis=-1), axis=-1)


def add_error_sym(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray,
                  model_pts: jnp.ndarray, tile: int = 4096) -> jnp.ndarray:
    """ADD-S: mean nearest-neighbor distance (symmetric objects)."""
    p = transform_points(model_pts, pose_pred)
    g = transform_points(model_pts, pose_gt)
    return jnp.mean(find_nearest_point_distance(p, g, tile=tile), axis=-1)


def projection_error(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray,
                     model_pts: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """Mean 2D reprojection distance in pixels."""
    p = project(model_pts, pose_pred, K)
    g = project(model_pts, pose_gt, K)
    return jnp.mean(jnp.linalg.norm(p - g, axis=-1), axis=-1)


def projection_error_sym(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray,
                         model_pts: jnp.ndarray, K: jnp.ndarray,
                         tile: int = 4096) -> jnp.ndarray:
    """Symmetric 2D projection error via nearest neighbor (ref :83-89)."""
    p = project(model_pts, pose_pred, K)
    g = project(model_pts, pose_gt, K)
    return jnp.mean(find_nearest_point_distance(p, g, tile=tile), axis=-1)


def cm_degree_errors(pose_pred: jnp.ndarray, pose_gt: jnp.ndarray):
    """(translation error in cm, rotation error in degrees)."""
    trans_cm = jnp.linalg.norm(pose_pred[..., :3, 3] - pose_gt[..., :3, 3],
                               axis=-1) * 100.0
    rot_deg = rotation_angle_deg(pose_pred[..., :3, :3],
                                 pose_gt[..., :3, :3])
    return trans_cm, rot_deg
