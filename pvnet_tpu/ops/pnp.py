"""Perspective-n-Point solvers in pure JAX: EPnP initialization + weighted
Levenberg-Marquardt refinement.

Replaces both of the reference's PnP paths with jittable, batchable code:

- plain path: ``cv2.solvePnP(..., SOLVEPNP_ITERATIVE)`` + Rodrigues
  (ref lib/utils/evaluation_utils.py:19-52),
- uncertainty path: cv2 P3P init on the best-4 weighted points + a Ceres
  autodiff Levenberg-Marquardt refinement whose residual is a 2x2 weight
  matrix times the reprojection error
  (ref lib/utils/extend_utils/extend_utils.py:63-114 and
  src/uncertainty_pnp.cpp:7-92).

The LM residual here matches the Ceres cost exactly
(ref uncertainty_pnp.cpp:25-31):

    r = [wxx*dx + wxy*dy,  wxy*dx + wyy*dy]    with (dx, dy) in pixels,

so identical weights produce identical minima. Initialization uses EPnP
(Lepetit et al., IJCV 2009) with a Gauss-Newton beta refinement — closed
form, fixed shapes, valid for any n >= 4 — instead of the reference's
host-side OpenCV call, keeping the whole image->pose path in one XLA
program. All solvers run in float32; points are conditioned (centered /
normalized) before the linear algebra so f32 is ample for the 5-21 keypoint
systems PVNet produces.
"""
from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from pvnet_tpu.ops.geometry import (pose_from_Rt, rodrigues,
                                    inverse_rodrigues, solve_spd_small)
from pvnet_tpu.ops.smalllinalg import (eigh_auto, inv3x3, so3_project,
                                       solve_small)

_HIGHEST = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# EPnP
# ---------------------------------------------------------------------------

def _control_points(pts3d: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Four control points: weighted centroid + principal axes. [4, 3]."""
    wsum = jnp.sum(w) + 1e-9
    c0 = jnp.sum(pts3d * w[:, None], axis=0) / wsum
    centered = pts3d - c0
    cov = (centered * w[:, None]).T @ centered / wsum
    lam, vec = eigh_auto(cov)                         # ascending
    # Floor eigenvalues relative to the cloud extent so planar / degenerate
    # configurations keep a well-conditioned 4th control point (1% of the
    # principal extent off-plane) instead of an epsilon one that blows up
    # the barycentric solve in f32.
    lam_floor = 1e-4 * jnp.max(lam) + 1e-10
    sigma = jnp.sqrt(jnp.maximum(lam, lam_floor))
    ctrl = c0 + (vec * sigma[None, :]).T               # [3, 3] rows
    return jnp.concatenate([c0[None], ctrl], axis=0)   # [4, 3]


def _barycentric(pts3d: jnp.ndarray, ctrl: jnp.ndarray) -> jnp.ndarray:
    """Barycentric coordinates of each point w.r.t. control points. [n, 4]."""
    C = jnp.concatenate([ctrl.T, jnp.ones((1, 4), pts3d.dtype)], axis=0)
    X = jnp.concatenate(
        [pts3d.T, jnp.ones((1, pts3d.shape[0]), pts3d.dtype)], axis=0)
    alphas = solve_small(C, X)                         # [4, n]
    return alphas.T


def _pairwise_dists(x: jnp.ndarray) -> jnp.ndarray:
    """6 pairwise distances between 4 points [4, 3] -> [6]."""
    idx_a = jnp.array([0, 0, 0, 1, 1, 2])
    idx_b = jnp.array([1, 2, 3, 2, 3, 3])
    d = x[idx_a] - x[idx_b]
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + 1e-12)


def _betas_gauss_newton(V: jnp.ndarray, dist_w: jnp.ndarray,
                        beta0: jnp.ndarray, iters: int = 8) -> jnp.ndarray:
    """Refine betas so camera control-point distances match world distances.

    V: [12, 4] null-space basis; camera control points = (V @ beta) reshaped
    [4, 3]. Minimizes sum over the 6 pairs of (|dc_i|^2 - |dw_i|^2)^2 with
    damped, accept-gated steps: on near-planar configurations the plain
    Gauss-Newton iteration is chaotically divergent (betas blow up to
    overflow within a few steps whatever the linear solver), so rejected
    steps keep the iterate and raise the damping, exactly like lm_refine.
    """
    idx_a = jnp.array([0, 0, 0, 1, 1, 2])
    idx_b = jnp.array([1, 2, 3, 2, 3, 3])
    Vr = V.T.reshape(4, 4, 3)                          # [basis, ctrl, 3]
    dV = Vr[:, idx_a, :] - Vr[:, idx_b, :]             # [basis=4, 6, 3]
    target = dist_w * dist_w                           # [6]

    def cost_of(beta):
        dc = jnp.einsum("k,kpc->pc", beta, dV)         # [6, 3]
        r = jnp.sum(dc * dc, axis=-1) - target         # [6]
        return r, jnp.sum(r * r)

    def body(state, _):
        beta, lam, cost = state
        dc = jnp.einsum("k,kpc->pc", beta, dV)
        r = jnp.sum(dc * dc, axis=-1) - target
        J = 2.0 * jnp.einsum("pc,kpc->pk", dc, dV)     # [6, 4]
        H = J.T @ J
        g = J.T @ r
        damped = (H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-12))
                  + 1e-12 * jnp.eye(4, dtype=beta.dtype))
        step = solve_spd_small(damped, g)
        beta_new = beta - step
        _, cost_new = cost_of(beta_new)
        accept = cost_new < cost                       # False for NaN
        beta = jnp.where(accept, beta_new, beta)
        cost = jnp.where(accept, cost_new, cost)
        # near-zero initial damping = pure GN on well-behaved instances
        # (the accept gate alone supplies the planar robustness); escalate
        # fast once a step diverges
        lam = jnp.clip(jnp.where(accept, lam * 0.1, lam * 100.0),
                       1e-12, 1e12)
        return (beta, lam, cost), None

    _, cost0 = cost_of(beta0)
    (beta, _, _), _ = jax.lax.scan(
        body, (beta0, jnp.asarray(1e-6, beta0.dtype), cost0), None,
        length=iters)
    return beta


def _procrustes(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rigid (R, t) minimizing sum w |R src + t - dst|^2 (Kabsch)."""
    wsum = jnp.sum(w) + 1e-9
    mu_s = jnp.sum(src * w[:, None], axis=0) / wsum
    mu_d = jnp.sum(dst * w[:, None], axis=0) / wsum
    H = ((src - mu_s) * w[:, None]).T @ (dst - mu_d)
    # nearest rotation to H^T == Vt^T diag(1,1,det) U^T of H's SVD — the
    # reflection-corrected Kabsch solution, custom-call-free
    R = so3_project(H.T)
    t = mu_d - R @ mu_s
    return R, t


def _homography_init(pts3d: jnp.ndarray, pts2d: jnp.ndarray,
                     K: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """Closed-form pose from a plane-to-image homography (IPPE-style).

    EPnP's 4-control-point formulation degrades badly on (near-)planar
    keypoint sets — the regime cv2.solvePnP covers with its IPPE planar
    solver (the reference's backend for `pnp()` / uncertainty init,
    ref evaluation_utils.py:143-201). Fit the best plane through the
    points (PCA), estimate the plane->pixel homography with a
    Hartley-normalized weighted DLT, and decompose K^-1 H into [r1 r2 | t]
    with SVD orthonormalization. On non-planar data the result is garbage
    — callers pick between this and EPnP by reprojection cost.
    """
    dt = pts3d.dtype
    wsum = jnp.sum(w) + 1e-9
    c = jnp.sum(pts3d * w[:, None], axis=0) / wsum
    X0 = pts3d - c
    cov = (X0 * w[:, None]).T @ X0
    _, evec = eigh_auto(cov)                          # ascending
    B = jnp.stack([evec[:, 2], evec[:, 1],
                   jnp.cross(evec[:, 2], evec[:, 1])], axis=1)  # [3, 3]
    uv = X0 @ B[:, :2]                                 # [n, 2] plane coords

    # Hartley normalization keeps the 9x9 normal matrix f32-conditioned
    def norm_T(p):
        mu = jnp.sum(p * w[:, None], axis=0) / wsum
        d = jnp.sqrt(jnp.sum((p - mu) ** 2, axis=-1) + 1e-12)
        s = jnp.sqrt(2.0) / (jnp.sum(d * w) / wsum + 1e-12)
        return (p - mu) * s, mu, s

    uvn, mu_p, s_p = norm_T(uv)
    imn, mu_i, s_i = norm_T(pts2d)

    x, y = uvn[:, 0], uvn[:, 1]
    u, v = imn[:, 0], imn[:, 1]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    ru = jnp.stack([-x, -y, -one, zero, zero, zero, u * x, u * y, u], -1)
    rv = jnp.stack([zero, zero, zero, -x, -y, -one, v * x, v * y, v], -1)
    A = jnp.concatenate([ru * jnp.sqrt(w)[:, None],
                         rv * jnp.sqrt(w)[:, None]], axis=0)   # [2n, 9]
    _, avec = eigh_auto(A.T @ A)
    Hn = avec[:, 0].reshape(3, 3)

    # denormalize: p_img = T_i^-1 Hn T_p, with T(p) = s (p - mu)
    Ti_inv = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]],
                       dt)
    Ti_inv = Ti_inv.at[0, 0].set(1.0 / s_i).at[1, 1].set(1.0 / s_i) \
        .at[0, 2].set(mu_i[0]).at[1, 2].set(mu_i[1])
    Tp = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], dt)
    Tp = Tp.at[0, 0].set(s_p).at[1, 1].set(s_p) \
        .at[0, 2].set(-s_p * mu_p[0]).at[1, 2].set(-s_p * mu_p[1])
    H = Ti_inv @ Hn @ Tp

    M = inv3x3(K.astype(dt)) @ H                       # ~ [r1 r2 | t']
    lam = 1.0 / (jnp.sqrt(jnp.sum(M[:, 0] ** 2)) + 1e-12)
    # cheirality: points must sit in front of the camera (z of t' > 0)
    lam = lam * jnp.where(M[2, 2] < 0, -1.0, 1.0)
    r1 = M[:, 0] * lam
    r2 = M[:, 1] * lam
    t_pl = M[:, 2] * lam
    P = jnp.stack([r1, r2, jnp.cross(r1, r2)], axis=1)
    P = so3_project(P)                                 # camera_R_plane
    R = P @ B.T
    t = t_pl - R @ c
    return pose_from_Rt(R, t)


def epnp(pts3d: jnp.ndarray, pts2d: jnp.ndarray, K: jnp.ndarray,
         weights: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """EPnP closed-form pose estimate.

    Args:
      pts3d: [n, 3] world points.
      pts2d: [n, 2] pixel observations.
      K:     [3, 3] intrinsics.
      weights: optional [n] non-negative scalar per-point weights; zero
        drops a point (the uncertainty path zeroes degenerate keypoints,
        ref evaluation_utils.py:172-175).

    Returns:
      [3, 4] pose [R | t].
    """
    with jax.default_matmul_precision("float32"):
        return _epnp_impl(pts3d, pts2d, K, weights)


def _epnp_impl(pts3d, pts2d, K, weights):
    n = pts3d.shape[0]
    dt = pts3d.dtype
    w = jnp.ones((n,), dt) if weights is None else weights
    w = w / (jnp.max(w) + 1e-12)

    ctrl_w = _control_points(pts3d, w)
    alphas = _barycentric(pts3d, ctrl_w)               # [n, 4]

    fx, fy = K[0, 0], K[1, 1]
    px, py = K[0, 2], K[1, 2]
    u, v = pts2d[:, 0], pts2d[:, 1]

    sw = jnp.sqrt(w)
    # M rows: for control j, columns 3j..3j+2
    row_u = jnp.stack([jnp.broadcast_to(fx, u.shape),
                       jnp.zeros_like(u), px - u], axis=-1)   # [n, 3]
    row_v = jnp.stack([jnp.zeros_like(v),
                       jnp.broadcast_to(fy, v.shape), py - v], axis=-1)
    Mu = (alphas[:, :, None] * row_u[:, None, :]).reshape(n, 12)
    Mv = (alphas[:, :, None] * row_v[:, None, :]).reshape(n, 12)
    M = jnp.concatenate([Mu * sw[:, None], Mv * sw[:, None]], axis=0)

    MtM = M.T @ M
    _, evec = eigh_auto(MtM)                          # ascending eigenvalues
    V = evec[:, :4]                                    # [12, 4] null basis

    dist_w = _pairwise_dists(ctrl_w)

    # Case N=1 closed-form beta seeds, one per null-basis vector. For
    # n >= 6 only V[:, 0] spans the (1-dim) null space, but at n = 4/5
    # the whole 4-dim basis is near-null and WHICH vector the
    # eigendecomposition puts first is an arbitrary ordering within the
    # cluster — the beta Gauss-Newton's basin depends on it (seeding only
    # V[:, 0] was measured to lose the global minimum on 4-point
    # instances when the eigh backend changed). Seed all four plus a
    # mixed perturbation; the reprojection argmin below arbitrates.
    def beta_case1(k):
        vk = V[:, k].reshape(4, 3)
        dv = _pairwise_dists(vk)
        return jnp.sum(dv * dist_w) / (jnp.sum(dv * dv) + 1e-12)

    seeds = [jnp.zeros((4,), dt).at[k].set(beta_case1(k))
             for k in range(4)]
    seeds.append(jnp.array([beta_case1(0), 1e-2, 1e-2, 1e-2], dt))

    def solve_from(beta0):
        beta = _betas_gauss_newton(V, dist_w, beta0)
        ctrl_c = (V @ beta).reshape(4, 3)
        # Enforce the rigid-scale constraint explicitly: even if the beta
        # Gauss-Newton stalls, the camera control-point distances must match
        # the world distances (Procrustes below is rotation+translation
        # only, so a residual scale error would corrupt the translation).
        dc = _pairwise_dists(ctrl_c)
        scale = jnp.sum(dc * dist_w) / (jnp.sum(dc * dc) + 1e-12)
        ctrl_c = ctrl_c * scale
        # cheirality: weighted mean depth of reconstructed points
        depths = alphas @ ctrl_c[:, 2]
        sign = jnp.where(jnp.sum(depths * w) < 0, -1.0, 1.0)
        ctrl_c = ctrl_c * sign
        pts_cam = alphas @ ctrl_c                      # [n, 3]
        R, t = _procrustes(pts3d, pts_cam, w)
        pose = pose_from_Rt(R, t)
        return pose

    def reproj_cost(pose):
        from pvnet_tpu.ops.geometry import project
        err = project(pts3d, pose, K) - pts2d
        return jnp.sum(w * jnp.sum(err * err, axis=-1))

    pose_seeds = jax.vmap(solve_from)(jnp.stack(seeds))
    pose_h = _homography_init(pts3d, pts2d, K, w)
    cands = jnp.concatenate([pose_seeds, pose_h[None]])
    costs = jax.vmap(reproj_cost)(cands)
    costs = jnp.where(jnp.isnan(costs), jnp.inf, costs)
    return cands[jnp.argmin(costs)]


# ---------------------------------------------------------------------------
# Levenberg-Marquardt refinement
# ---------------------------------------------------------------------------

def _residuals(pose6: jnp.ndarray, pts3d: jnp.ndarray, pts2d: jnp.ndarray,
               K: jnp.ndarray, w3: jnp.ndarray) -> jnp.ndarray:
    """Weighted reprojection residuals, matching the Ceres cost
    (ref uncertainty_pnp.cpp:17-33). pose6 = (angle-axis, t). Returns [2n].
    """
    R = rodrigues(pose6[:3])
    cam = pts3d @ R.T + pose6[3:]
    z = jnp.maximum(cam[:, 2], 1e-5)
    proj_x = K[0, 0] * cam[:, 0] / z + K[0, 2]
    proj_y = K[1, 1] * cam[:, 1] / z + K[1, 2]
    dx = proj_x - pts2d[:, 0]
    dy = proj_y - pts2d[:, 1]
    r0 = w3[:, 0] * dx + w3[:, 1] * dy
    r1 = w3[:, 1] * dx + w3[:, 2] * dy
    return jnp.concatenate([r0, r1])


def lm_refine(pose0: jnp.ndarray, pts3d: jnp.ndarray, pts2d: jnp.ndarray,
              K: jnp.ndarray, w3: jnp.ndarray, iters: int = 16
              ) -> jnp.ndarray:
    """Fixed-iteration Levenberg-Marquardt on a 6-vector (angle-axis + t).

    The same minimization Ceres runs on the reference's uncertainty path
    (ref uncertainty_pnp.cpp:61-92) but with a fixed trust-region schedule
    so the whole solve is one unrolled XLA loop. Rejected steps keep the
    previous iterate and raise the damping, accepted steps lower it.

    Args:
      pose0: [3, 4] initial pose.
      w3:    [n, 3] per-point (wxx, wxy, wyy) weight-matrix entries.
    Returns:
      ([3, 4] refined pose, final scalar cost).
    """
    with jax.default_matmul_precision("float32"):
        return _lm_refine_impl(pose0, pts3d, pts2d, K, w3, iters)


def _lm_refine_impl(pose0, pts3d, pts2d, K, w3, iters):
    p0 = jnp.concatenate([inverse_rodrigues(pose0[:, :3]), pose0[:, 3]])
    res_fn = lambda p: _residuals(p, pts3d, pts2d, K, w3)
    jac_fn = jax.jacfwd(res_fn)

    def body(state, _):
        p, lam, cost = state
        r = res_fn(p)
        J = jac_fn(p)
        H = J.T @ J
        g = J.T @ r
        damped = H + lam * jnp.diag(jnp.maximum(jnp.diag(H), 1e-9))
        # SPD by construction -> unrolled Cholesky (jnp.linalg.solve's
        # batched tiny-LU serializes on TPU; see geometry.solve_spd_small)
        step = solve_spd_small(
            damped + 1e-12 * jnp.eye(6, dtype=p.dtype), g)
        p_new = p - step
        cost_new = jnp.sum(res_fn(p_new) ** 2)
        accept = cost_new < cost
        p = jnp.where(accept, p_new, p)
        cost = jnp.where(accept, cost_new, cost)
        lam = jnp.clip(jnp.where(accept, lam * 0.33, lam * 3.0),
                       1e-10, 1e8)
        return (p, lam, cost), None

    cost0 = jnp.sum(res_fn(p0) ** 2)
    (p, _, cost), _ = jax.lax.scan(
        body, (p0, jnp.asarray(1e-3, p0.dtype), cost0), None, length=iters)
    return pose_from_Rt(rodrigues(p[:3]), p[3:]), cost


def _lm_multi_start(pose0: jnp.ndarray, pts3d: jnp.ndarray,
                    pts2d: jnp.ndarray, K: jnp.ndarray, w3: jnp.ndarray,
                    iters: int) -> jnp.ndarray:
    """LM from the init plus three 180-degree flips about the object
    centroid; keep the lowest-cost result.

    Near-planar keypoint configurations admit a two-fold pose ambiguity that
    traps single-start LM in the wrong basin; the flipped candidates cover
    the mirror poses. Each flip preserves the centroid's camera position
    (t' = t + (R - R')c) so every candidate starts near the observations.
    """
    c = jnp.mean(pts3d, axis=0)
    R0 = pose0[:, :3]
    t0 = pose0[:, 3]

    flips = jnp.stack([
        jnp.eye(3, dtype=pose0.dtype),
        jnp.diag(jnp.array([1.0, -1.0, -1.0], pose0.dtype)),
        jnp.diag(jnp.array([-1.0, 1.0, -1.0], pose0.dtype)),
        jnp.diag(jnp.array([-1.0, -1.0, 1.0], pose0.dtype)),
    ])                                                  # [4, 3, 3]
    Rs = jnp.einsum("ij,njk->nik", R0, flips)
    ts = t0 + jnp.einsum("ij,j->i", R0, c) - jnp.einsum("nij,j->ni", Rs, c)
    cands = jnp.concatenate([Rs, ts[..., None]], axis=-1)  # [4, 3, 4]

    poses, costs = jax.vmap(
        lambda p: lm_refine(p, pts3d, pts2d, K, w3, iters=iters))(cands)
    return poses[jnp.argmin(costs)]


# ---------------------------------------------------------------------------
# Public solvers
# ---------------------------------------------------------------------------

def pnp(pts3d: jnp.ndarray, pts2d: jnp.ndarray, K: jnp.ndarray,
        iters: int = 16) -> jnp.ndarray:
    """Plain PnP: EPnP init + identity-weight LM refinement.

    Functional equivalent of the reference's ``pnp()``
    (ref evaluation_utils.py:19-52, cv2.SOLVEPNP_ITERATIVE).
    """
    n = pts3d.shape[0]
    w3 = jnp.concatenate([jnp.ones((n, 1), pts3d.dtype),
                          jnp.zeros((n, 1), pts3d.dtype),
                          jnp.ones((n, 1), pts3d.dtype)], axis=1)
    pose0 = epnp(pts3d, pts2d, K)
    return _lm_multi_start(pose0, pts3d, pts2d, K, w3, iters)


def uncertainty_pnp(pts2d: jnp.ndarray, weights: jnp.ndarray,
                    pts3d: jnp.ndarray, K: jnp.ndarray, iters: int = 16
                    ) -> jnp.ndarray:
    """Uncertainty-weighted PnP.

    Args mirror the reference wrapper (ref extend_utils.py:63-114):
      pts2d:   [n, 2] voted keypoint means.
      weights: [n, 3] (wxx, wxy, wyy) rows of the 2x2 weight matrices —
        typically inv_sqrtm_2x2 of the voting covariance
        (ref evaluation_utils.py:172-181); degenerate keypoints carry zeros.
      pts3d:   [n, 3] canonical 3D keypoints.
      K:       [3, 3].
    """
    scalar_w = weights[:, 0] + weights[:, 2]           # trace, >= 0
    pose0 = epnp(pts3d, pts2d, K, weights=scalar_w)
    return _lm_multi_start(pose0, pts3d, pts2d, K, weights, iters)


def uncertainty_pnp_v2(pts2d: jnp.ndarray, covars: jnp.ndarray,
                       pts3d: jnp.ndarray, K: jnp.ndarray, iters: int = 16
                       ) -> jnp.ndarray:
    """Covariance-input variant: scalar weights 1/lambda_max(cov)
    (ref extend_utils.py:116-177)."""
    a = covars[:, 0, 0]
    b = 0.5 * (covars[:, 0, 1] + covars[:, 1, 0])
    d = covars[:, 1, 1]
    gap = jnp.sqrt(jnp.maximum(0.25 * (a - d) ** 2 + b * b, 0.0))
    lam_max = 0.5 * (a + d) + gap
    wscalar = jnp.where(a < 1e-5, 0.0, 1.0 / jnp.maximum(lam_max, 1e-12))
    w3 = jnp.stack([wscalar, jnp.zeros_like(wscalar), wscalar], axis=-1)
    pose0 = epnp(pts3d, pts2d, K, weights=wscalar)
    return _lm_multi_start(pose0, pts3d, pts2d, K, w3, iters)


# Batched variants (vmap over leading axis; K may be shared or per-item).
pnp_batch = jax.vmap(pnp, in_axes=(None, 0, None))
pnp_batch_K = jax.vmap(pnp, in_axes=(None, 0, 0))
uncertainty_pnp_batch = jax.vmap(uncertainty_pnp, in_axes=(0, 0, None, None))
uncertainty_pnp_batch_K = jax.vmap(uncertainty_pnp, in_axes=(0, 0, None, 0))
