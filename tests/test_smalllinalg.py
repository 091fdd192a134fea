"""ops/smalllinalg.py vs numpy LAPACK: the pose pipeline's custom-call-free
eigh / solve / inv / SO(3)-projection replacements."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.ops import smalllinalg as sl


@pytest.mark.parametrize("n", [2, 3, 4, 9, 12])
def test_eigh_matches_numpy(rng, n):
    for trial in range(5):
        A = rng.randn(n, n).astype(np.float32)
        A = A + A.T
        lam, V = jax.jit(sl.eigh_small)(jnp.asarray(A))
        lam = np.asarray(lam)
        V = np.asarray(V)
        lam_np = np.linalg.eigvalsh(A)
        np.testing.assert_allclose(lam, lam_np, rtol=1e-4,
                                   atol=1e-4 * np.abs(lam_np).max())
        # eigen-equation residual (sign/degeneracy-free check)
        resid = A @ V - V * lam[None, :]
        assert np.abs(resid).max() < 1e-3 * max(1.0, np.abs(lam).max())
        # orthonormal
        np.testing.assert_allclose(V.T @ V, np.eye(n), atol=1e-4)


def test_eigh_degenerate_eigenvalues(rng):
    # repeated eigenvalues: eigen-equation must still hold
    Q, _ = np.linalg.qr(rng.randn(4, 4))
    A = (Q @ np.diag([2.0, 2.0, 2.0, 5.0]) @ Q.T).astype(np.float32)
    lam, V = sl.eigh_small(jnp.asarray(A))
    resid = A @ np.asarray(V) - np.asarray(V) * np.asarray(lam)[None, :]
    assert np.abs(resid).max() < 1e-3


@pytest.mark.parametrize("m", [1, 5])
def test_solve_matches_numpy(rng, m):
    for trial in range(5):
        A = rng.randn(4, 4).astype(np.float32) + 4 * np.eye(4, dtype=np.float32)
        # shuffle rows so pivoting actually runs
        A = A[rng.permutation(4)]
        B = rng.randn(4, m).astype(np.float32)
        X = np.asarray(jax.jit(sl.solve_small)(jnp.asarray(A),
                                               jnp.asarray(B)))
        np.testing.assert_allclose(X, np.linalg.solve(A, B), rtol=1e-3,
                                   atol=1e-4)


def test_solve_vector_rhs(rng):
    A = rng.randn(4, 4).astype(np.float32) + 4 * np.eye(4, dtype=np.float32)
    b = rng.randn(4).astype(np.float32)
    x = np.asarray(sl.solve_small(jnp.asarray(A), jnp.asarray(b)))
    assert x.shape == (4,)
    np.testing.assert_allclose(x, np.linalg.solve(A, b), rtol=1e-3,
                               atol=1e-4)


def test_solve_needs_pivoting():
    # zero leading pivot: naive elimination would divide by zero
    A = np.array([[0.0, 1.0, 0, 0], [1.0, 0.0, 0, 0],
                  [0, 0, 1.0, 0], [0, 0, 0, 1.0]], np.float32)
    b = np.array([1.0, 2.0, 3.0, 4.0], np.float32)
    x = np.asarray(sl.solve_small(jnp.asarray(A), jnp.asarray(b)))
    np.testing.assert_allclose(x, [2.0, 1.0, 3.0, 4.0], atol=1e-5)


def test_inv3x3(rng):
    for trial in range(5):
        M = rng.randn(3, 3).astype(np.float32) + 2 * np.eye(3,
                                                            dtype=np.float32)
        Minv = np.asarray(sl.inv3x3(jnp.asarray(M)))
        np.testing.assert_allclose(Minv @ M, np.eye(3), atol=1e-4)


def _nearest_rotation_np(M):
    U, _, Vt = np.linalg.svd(M)
    D = np.diag([1.0, 1.0, np.sign(np.linalg.det(U @ Vt))])
    return U @ D @ Vt


@pytest.mark.parametrize("kind", ["generic", "reflection", "planar"])
def test_so3_project(rng, kind):
    for trial in range(5):
        if kind == "generic":
            M = rng.randn(3, 3).astype(np.float32)
        elif kind == "reflection":
            Q, _ = np.linalg.qr(rng.randn(3, 3))
            Q[:, 0] *= -np.linalg.det(Q)        # force det -1
            M = (Q * np.array([3.0, 2.0, 1.0])).astype(np.float32)
        else:                                    # rank-2 (planar Kabsch)
            a = rng.randn(3, 2).astype(np.float32)
            b = rng.randn(2, 3).astype(np.float32)
            M = a @ b
        R = np.asarray(sl.so3_project(jnp.asarray(M)))
        np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-4)
        assert np.linalg.det(R) > 0.9
        np.testing.assert_allclose(R, _nearest_rotation_np(M), atol=2e-3)


def test_vmap_batching(rng):
    A = rng.randn(16, 3, 3).astype(np.float32)
    A = A + np.swapaxes(A, 1, 2)
    lam, V = jax.vmap(sl.eigh_small)(jnp.asarray(A))
    assert lam.shape == (16, 3) and V.shape == (16, 3, 3)
    for i in range(16):
        np.testing.assert_allclose(np.asarray(lam[i]),
                                   np.linalg.eigvalsh(A[i]), rtol=1e-4,
                                   atol=1e-4)
