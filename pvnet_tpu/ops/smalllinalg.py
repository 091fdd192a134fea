"""Custom-call-free small-matrix linear algebra (pure XLA HLO).

``jnp.linalg.{eigh, svd, solve, inv}`` lower to LAPACK *custom calls* on
XLA:CPU. Two reasons they are banned from the pose pipeline:

1. **Serialized artifacts crash.** A ``jax.export`` artifact containing a
   LAPACK custom call segfaults on deserialize+call in a fresh XLA:CPU
   process (reproduced 2026-08-20 with a minimal ``jnp.linalg.eigh``
   round-trip; the exporting process is fine because it executes its own
   traced lowering). TPU lowers these ops to pure HLO, which is why only
   CPU serving/tests ever crashed.
2. **TPU speed.** The generic lowerings run QR-iteration loops sized for
   arbitrary n; the pose solvers only ever need n <= 12 symmetric
   eigendecompositions, 4x4 linear solves, and nearest-rotation
   projections, all batched — a fixed-sweep cyclic Jacobi and unrolled
   elimination compile to straight-line vector code.

Everything here is differentiable-enough (smooth except at eigenvalue
crossings, same as the closed forms it replaces), works under vmap/jit,
and is validated against numpy in tests/test_smalllinalg.py.

The reference reaches these factorizations through OpenCV/Ceres on the
host (ref lib/utils/evaluation_utils.py:19-52, src/uncertainty_pnp.cpp);
here they are part of the single fused XLA program.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _jacobi_sweeps(n: int) -> int:
    # cyclic Jacobi converges quadratically; measured against numpy:
    # 6 sweeps reach f32 roundoff for n<=4, 8 for n<=9, 10 for n<=12
    if n <= 4:
        return 6
    if n <= 9:
        return 8
    return 10


def eigh_small(A: jnp.ndarray, sweeps: int | None = None
               ) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Symmetric eigendecomposition of a small [n, n] matrix by cyclic
    Jacobi rotations. Returns (eigenvalues ascending [n], eigenvectors as
    columns [n, n]) matching the jnp.linalg.eigh convention
    (``A @ V[:, i] == lam[i] * V[:, i]``). n is static; use vmap to batch.
    """
    n = A.shape[-1]
    assert A.shape[-2:] == (n, n)
    if sweeps is None:
        sweeps = _jacobi_sweeps(n)
    A = 0.5 * (A + A.T)
    V = jnp.eye(n, dtype=A.dtype)
    eye = jnp.eye(n, dtype=A.dtype)

    # Each rotation is expressed as J = I + (c-1)(E_pp + E_qq)
    # + s (E_pq - E_qp) with CONSTANT one-hot matrices, applied by matmul
    # (A <- J^T A J, V <- V J). No row/column scatters: the
    # dynamic-update-slice formulation of this loop reliably SEGFAULTED
    # the XLA:CPU *compiler* inside the vmapped EPnP program (2026-08-20,
    # fori_loop and scan forms alike); matmul chains compile robustly and
    # batch into einsums under vmap.
    def one_hot2(p, q):
        d = jnp.zeros((n, n), A.dtype).at[p, p].set(1.0).at[q, q].set(1.0)
        x = jnp.zeros((n, n), A.dtype).at[p, q].set(1.0).at[q, p].set(-1.0)
        return d, x  # concrete constants (p, q static)

    pairs = [(p, q) for p in range(n - 1) for q in range(p + 1, n)]
    consts = [one_hot2(p, q) for p, q in pairs]

    def sweep(AV, _):
        A, V = AV
        for (p, q), (D, X) in zip(pairs, consts):
            # rotation zeroing A'[p,q]: tan(2t) = 2 apq / (aqq - app)
            theta = 0.5 * jnp.arctan2(2.0 * A[p, q], A[q, q] - A[p, p])
            c = jnp.cos(theta)
            s = jnp.sin(theta)
            J = eye + (c - 1.0) * D + s * X
            A = J.T @ A @ J
            V = V @ J
        return (A, V), None

    (A, V), _ = jax.lax.scan(sweep, (A, V), None, length=sweeps)

    lam = jnp.diagonal(A)
    order = jnp.argsort(lam)
    return lam[order], V[:, order]


def eigh_auto(A: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """``jnp.linalg.eigh`` on TPU, :func:`eigh_small` elsewhere.

    TPU lowers eigh to pure HLO — no custom call, artifact-safe, and
    measurably faster than the matmul-form Jacobi chain (the all-Jacobi
    PnP regressed the b128 pose-path PnP stage 8.6 -> 23.3 ms on v5e).
    XLA:CPU lowers it to a LAPACK custom call, which both crashes
    deserialized ``jax.export`` artifacts (module docstring) and is what
    the CPU-pinned export CLI must avoid — so CPU tracing keeps the
    Jacobi path. Dispatch is trace-time via ``jax.default_backend()``:
    correct for every in-repo flow (CPU work is always process-pinned via
    PVNET_PLATFORM / jax_platforms), wrong only for a hand-built CPU jit
    inside a TPU-default process, which no tool does."""
    if jax.default_backend() == "tpu":
        return jnp.linalg.eigh(A)
    return eigh_small(A)


def solve_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for a small square A [n, n], B [n] or [n, m], by
    unrolled Gaussian elimination with partial pivoting (no LAPACK LU
    custom call; jnp.linalg.solve's batched tiny-LU also serializes on
    TPU — see geometry.solve_spd_small). n static; vmap to batch."""
    n = A.shape[-1]
    assert A.shape[-2:] == (n, n)
    vec = B.ndim == 1
    if vec:
        B = B[:, None]
    M = jnp.concatenate([A, B], axis=1).astype(A.dtype)    # [n, n+m]

    for k in range(n):
        # partial pivot: swap row k with the max-|pivot| row below
        piv = k + jnp.argmax(jnp.abs(M[k:, k]))
        rk = M[k, :]
        rp = M[piv, :]
        M = M.at[k, :].set(rp).at[piv, :].set(
            jnp.where(piv == k, rp, rk))
        inv_p = 1.0 / jnp.where(jnp.abs(M[k, k]) > 1e-30, M[k, k],
                                jnp.asarray(1e-30, M.dtype))
        factors = M[:, k] * inv_p
        factors = factors.at[k].set(0.0)                   # keep row k
        M = M - factors[:, None] * M[k, :][None, :]

    X = M[:, n:] / jnp.diagonal(M[:, :n])[:, None]
    return X[:, 0] if vec else X


def inv3x3(M: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / det)."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), b * f - c * e]),
        jnp.stack([B, a * i - c * g, -(a * f - c * d)]),
        jnp.stack([C, -(a * h - b * g), a * e - b * d]),
    ])
    return adj / det


def so3_project(M: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Nearest rotation to a 3x3 matrix: argmax_{R in SO(3)} tr(R^T M).

    Equals U diag(1, 1, det(UV^T)) V^T for the SVD M = U S V^T — i.e. the
    reflection-corrected Kabsch/polar projection — built custom-call-free:
    eigh_small(M^T M) gives V and singular values; the two strongest left
    vectors come from M v / s with Gram-Schmidt, and the weakest pair is
    completed with cross products, which bakes in the det correction
    (u1xu2 pairs with v1xv2 regardless of M's handedness)."""
    lam, V = eigh_small(M.T @ M)                        # ascending: the
    # 3x3 Jacobi (6 sweeps of 3 rotations) beats jnp.linalg.eigh here on
    # TPU too — 11.8 vs 12.8 ms b128 PnP stage (generic eigh pays its
    # QR-iteration scaffolding; measured 2026-08-20)
    v1, v2 = V[:, 1], V[:, 2]
    u2 = M @ v2
    u2 = u2 / jnp.sqrt(jnp.sum(u2 * u2) + eps)
    u1 = M @ v1
    u1 = u1 - jnp.sum(u1 * u2) * u2
    n1 = jnp.sqrt(jnp.sum(u1 * u1))
    # rank-1 guard: any unit vector orthogonal to u2 (choose the larger of
    # two candidate crosses for stability)
    alt_a = jnp.cross(u2, jnp.array([1.0, 0.0, 0.0], M.dtype))
    alt_b = jnp.cross(u2, jnp.array([0.0, 1.0, 0.0], M.dtype))
    alt = jnp.where(jnp.sum(alt_a * alt_a) > jnp.sum(alt_b * alt_b),
                    alt_a, alt_b)
    alt = alt / jnp.sqrt(jnp.sum(alt * alt) + eps)
    u1 = jnp.where(n1 > 1e-6, u1 / jnp.sqrt(n1 * n1 + eps), alt)
    u0 = jnp.cross(u1, u2)
    v0 = jnp.cross(v1, v2)
    return (jnp.outer(u2, v2) + jnp.outer(u1, v1) + jnp.outer(u0, v0))
