"""Differentiable pinhole-camera / SO(3) geometry in pure JAX.

Semantics mirror the reference's numpy utilities (ref lib/utils/base_utils.py:
Projector.project/project_K at :252-294) but are jit/vmap/grad-compatible and
shape-polymorphic over leading batch dims.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

# Pose math operates on tiny tensors where full f32 accuracy matters (TPU
# matmuls would otherwise round through bf16).
_HIGHEST = jax.lax.Precision.HIGHEST


def transform_points(pts: jnp.ndarray, pose: jnp.ndarray) -> jnp.ndarray:
    """Apply a rigid transform.

    Args:
      pts:  [..., n, 3] model points.
      pose: [..., 3, 4] rigid transform [R | t].

    Returns:
      [..., n, 3] transformed points (R @ p + t).
    """
    R = pose[..., :3, :3]
    t = pose[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts,
                      precision=_HIGHEST) + t[..., None, :]


def project(pts: jnp.ndarray, pose: jnp.ndarray, K: jnp.ndarray,
            eps: float = 1e-5) -> jnp.ndarray:
    """Project 3D points to pixels. (ref base_utils.py:project_K :289-294)

    Args:
      pts:  [..., n, 3]
      pose: [..., 3, 4]
      K:    [..., 3, 3]

    Returns:
      [..., n, 2] pixel coordinates (x, y).
    """
    cam = transform_points(pts, pose)
    z = cam[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    uvw = jnp.einsum("...ij,...nj->...ni", K, cam, precision=_HIGHEST)
    return uvw[..., :2] / z


def project_cam(cam: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-5
                ) -> jnp.ndarray:
    """Project camera-frame 3D points [..., n, 3] with K [..., 3, 3]."""
    z = cam[..., 2:3]
    z = jnp.where(jnp.abs(z) < eps, jnp.where(z < 0, -eps, eps), z)
    uvw = jnp.einsum("...ij,...nj->...ni", K, cam, precision=_HIGHEST)
    return uvw[..., :2] / z


# ---------------------------------------------------------------------------
# SO(3): angle-axis <-> rotation matrix
# ---------------------------------------------------------------------------

def rodrigues(w: jnp.ndarray) -> jnp.ndarray:
    """Angle-axis [..., 3] -> rotation matrix [..., 3, 3].

    Small-angle-safe Rodrigues formula (Taylor expansion below 1e-8 of
    theta^2), the same parameterization Ceres' AngleAxisRotatePoint uses on
    the reference's LM path (ref uncertainty_pnp.cpp:20).
    """
    theta_sq = jnp.sum(w * w, axis=-1)
    theta = jnp.sqrt(jnp.maximum(theta_sq, 1e-24))
    small = theta_sq < 1e-12

    # sin(t)/t and (1-cos(t))/t^2 with Taylor fallbacks
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0,
                  (1.0 - jnp.cos(theta)) / jnp.maximum(theta_sq, 1e-24))

    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]
    zeros = jnp.zeros_like(wx)
    Wx = jnp.stack([
        jnp.stack([zeros, -wz, wy], axis=-1),
        jnp.stack([wz, zeros, -wx], axis=-1),
        jnp.stack([-wy, wx, zeros], axis=-1),
    ], axis=-2)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), Wx.shape)
    return eye + a[..., None, None] * Wx + b[..., None, None] * (Wx @ Wx)


def inverse_rodrigues(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix [..., 3, 3] -> angle-axis [..., 3].

    Uses the quaternion route for numerical stability near theta = 0 and pi.
    """
    q = matrix_to_quaternion(R)
    return quaternion_to_angle_axis(q)


def matrix_to_quaternion(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix -> unit quaternion (w, x, y, z), Shepperd's method
    implemented branch-free for jit."""
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # Four candidate constructions; pick the best-conditioned one.
    qw0 = jnp.sqrt(jnp.maximum(1.0 + tr, 1e-12)) / 2.0
    q0 = jnp.stack([qw0, (m21 - m12) / (4 * qw0), (m02 - m20) / (4 * qw0),
                    (m10 - m01) / (4 * qw0)], axis=-1)

    qx1 = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) / 2.0
    q1 = jnp.stack([(m21 - m12) / (4 * qx1), qx1, (m01 + m10) / (4 * qx1),
                    (m02 + m20) / (4 * qx1)], axis=-1)

    qy2 = jnp.sqrt(jnp.maximum(1.0 - m00 + m11 - m22, 1e-12)) / 2.0
    q2 = jnp.stack([(m02 - m20) / (4 * qy2), (m01 + m10) / (4 * qy2), qy2,
                    (m12 + m21) / (4 * qy2)], axis=-1)

    qz3 = jnp.sqrt(jnp.maximum(1.0 - m00 - m11 + m22, 1e-12)) / 2.0
    q3 = jnp.stack([(m10 - m01) / (4 * qz3), (m02 + m20) / (4 * qz3),
                    (m12 + m21) / (4 * qz3), qz3], axis=-1)

    cand = jnp.stack([q0, q1, q2, q3], axis=-2)          # [..., 4, 4]
    scores = jnp.stack([tr, m00 - m11 - m22, -m00 + m11 - m22,
                        -m00 - m11 + m22], axis=-1)       # [..., 4]
    idx = jnp.argmax(scores, axis=-1)
    q = jnp.take_along_axis(cand, idx[..., None, None].repeat(4, -1),
                            axis=-2)[..., 0, :]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonical sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def quaternion_to_angle_axis(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion (w, x, y, z) -> angle-axis vector."""
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    xyz = q[..., 1:]
    sin_half = jnp.linalg.norm(xyz, axis=-1)
    theta = 2.0 * jnp.arctan2(sin_half, w)
    small = sin_half < 1e-8
    scale = jnp.where(small, 2.0, theta / jnp.maximum(sin_half, 1e-12))
    return xyz * scale[..., None]


def rotation_angle_deg(R1: jnp.ndarray, R2: jnp.ndarray) -> jnp.ndarray:
    """Geodesic angle (degrees) between rotations.
    (ref evaluation_utils.py:cm_degree_5_metric :136-141)"""
    d = jnp.einsum("...ij,...kj->...ik", R1, R2)
    tr = jnp.trace(d, axis1=-2, axis2=-1)
    tr = jnp.minimum(tr, 3.0)
    return jnp.rad2deg(jnp.arccos(jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)))


def pose_from_Rt(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Stack R [..., 3, 3] and t [..., 3] into [..., 3, 4]."""
    return jnp.concatenate([R, t[..., :, None]], axis=-1)


def inv_sqrtm_2x2(S: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form inverse square root of symmetric PSD 2x2 matrices.

    Replaces the reference's per-keypoint ``inv(scipy.linalg.sqrtm(cov))``
    (ref evaluation_utils.py:172-179) with an eigendecomposition of a
    symmetric 2x2, batched and jittable.

    Args:
      S: [..., 2, 2] symmetric PSD.
    Returns:
      [..., 2, 2] S^{-1/2}.
    """
    a = S[..., 0, 0]
    b = 0.5 * (S[..., 0, 1] + S[..., 1, 0])
    d = S[..., 1, 1]
    tr = a + d
    det = a * d - b * b
    gap = jnp.sqrt(jnp.maximum(0.25 * tr * tr - det, 0.0))
    l1 = jnp.maximum(0.5 * tr + gap, eps)
    l2 = jnp.maximum(0.5 * tr - gap, eps)

    # eigenvector for l1: pick the better-conditioned of the two candidate
    # constructions (b, l1-a) and (l1-d, b); fall back to (1, 0) when the
    # matrix is (near-)isotropic and any direction works.
    ax = jnp.stack([b, l1 - a], axis=-1)
    bx = jnp.stack([l1 - d, b], axis=-1)
    v = jnp.where((jnp.sum(ax * ax, -1) >= jnp.sum(bx * bx, -1))[..., None],
                  ax, bx)
    n1 = jnp.sqrt(jnp.sum(v * v, axis=-1))
    iso = n1 < eps
    v1x = jnp.where(iso, 1.0, v[..., 0] / jnp.maximum(n1, eps))
    v1y = jnp.where(iso, 0.0, v[..., 1] / jnp.maximum(n1, eps))
    v2x, v2y = -v1y, v1x

    s1 = 1.0 / jnp.sqrt(l1)
    s2 = 1.0 / jnp.sqrt(l2)
    m00 = s1 * v1x * v1x + s2 * v2x * v2x
    m01 = s1 * v1x * v1y + s2 * v2x * v2y
    m11 = s1 * v1y * v1y + s2 * v2y * v2y
    return jnp.stack([
        jnp.stack([m00, m01], axis=-1),
        jnp.stack([m01, m11], axis=-1),
    ], axis=-2)


def solve_2x2(A: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-12
              ) -> jnp.ndarray:
    """Closed-form solve of batched 2x2 systems A x = b.

    Replaces the reference's ``b_inv`` / torch.gesv on [vn, 2, 2] stacks
    (ref ransac_voting_gpu.py:503-512).

    Args:
      A: [..., 2, 2]; b: [..., 2].
    Returns:
      x: [..., 2]; where |det| < eps the solution is 0.
    """
    a00, a01 = A[..., 0, 0], A[..., 0, 1]
    a10, a11 = A[..., 1, 0], A[..., 1, 1]
    det = a00 * a11 - a01 * a10
    safe = jnp.abs(det) > eps
    inv_det = jnp.where(safe, 1.0 / jnp.where(safe, det, 1.0), 0.0)
    x0 = (a11 * b[..., 0] - a01 * b[..., 1]) * inv_det
    x1 = (-a10 * b[..., 0] + a00 * b[..., 1]) * inv_det
    return jnp.stack([x0, x1], axis=-1)


def solve_spd_small(A: jnp.ndarray, b: jnp.ndarray,
                    eps: float = 1e-10) -> jnp.ndarray:
    """Unrolled Cholesky solve of one small SPD system A x = b.

    ``jnp.linalg.solve`` lowers batched tiny systems to an LU routine with
    pivoting loops that serialize badly on TPU; for the LM normal
    equations (6x6, SPD by construction: J^T J + positive damping) an
    unrolled Cholesky + two triangular substitutions compiles to a flat
    chain of fused scalar FMAs — batch via ``jax.vmap``.

    Near-rank-deficient systems (e.g. planar EPnP beta refinement, where
    f32 cancellation drives pivots negative) take a *scale-relative*
    pivot floor — eps * max(diag A) — a modified-Cholesky guard that
    keeps the factor bounded instead of overflowing to NaN the way an
    absolute clamp would.

    Args:
      A: [n, n] symmetric positive definite (n static, intended n <= ~8).
      b: [n].
    Returns:
      x: [n].
    """
    n = A.shape[-1]
    dmax = A[0, 0]
    for j in range(1, n):
        dmax = jnp.maximum(dmax, A[j, j])
    floor = eps * dmax + 1e-30
    L = [[None] * n for _ in range(n)]
    for j in range(n):
        s = A[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k]
        d = jnp.sqrt(jnp.maximum(s, floor))
        L[j][j] = d
        inv_d = 1.0 / d
        for i in range(j + 1, n):
            s = A[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv_d
    y = [None] * n
    for i in range(n):
        s = b[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s / L[i][i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s / L[i][i]
    return jnp.stack(x)


def find_nearest_point_distance(ref_pts: jnp.ndarray, que_pts: jnp.ndarray,
                                tile: int = 4096) -> jnp.ndarray:
    """For each query point, the distance to its nearest reference point.

    TPU-native replacement for the reference's brute-force CUDA NN kernel
    (ref lib/utils/extend_utils/src/nearest_neighborhood.cu:48-117 and the
    wrapper evaluation_utils.py:54-62) used for symmetric-class ADD-S.
    Pairwise distances are computed in tiles over the reference axis so large
    meshes never materialize an [n_que, n_ref] buffer bigger than
    [n_que, tile].

    Args:
      ref_pts: [..., n_ref, d]
      que_pts: [..., n_que, d]
    Returns:
      [..., n_que] Euclidean distance to nearest reference point.
    """
    n_ref = ref_pts.shape[-2]
    if n_ref <= tile:
        d2 = jnp.sum(
            (que_pts[..., :, None, :] - ref_pts[..., None, :, :]) ** 2,
            axis=-1)
        return jnp.sqrt(jnp.min(d2, axis=-1))

    pad = (-n_ref) % tile
    ref_padded = jnp.concatenate(
        [ref_pts, jnp.full(ref_pts.shape[:-2] + (pad, ref_pts.shape[-1]),
                           jnp.inf, ref_pts.dtype)], axis=-2)
    n_tiles = ref_padded.shape[-2] // tile
    ref_tiles = jnp.moveaxis(
        ref_padded.reshape(ref_padded.shape[:-2] + (n_tiles, tile,
                                                    ref_padded.shape[-1])),
        -3, 0)

    def body(carry, ref_tile):
        d2 = jnp.sum(
            (que_pts[..., :, None, :] - ref_tile[..., None, :, :]) ** 2,
            axis=-1)
        return jnp.minimum(carry, jnp.min(d2, axis=-1)), None

    init = jnp.full(que_pts.shape[:-1], jnp.inf, que_pts.dtype)
    best, _ = jax.lax.scan(body, init, ref_tiles)
    return jnp.sqrt(best)
