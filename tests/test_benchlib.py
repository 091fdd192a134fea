"""Regression tests for the timing harness (pvnet_tpu/utils/benchlib.py).

Round 2 shipped BENCH_r02.json stage numbers that were ~200x too fast:
``_perturb`` scaled float carries by (1 + 1e-6), which is far below the
bf16 ULP (2^-8 relative), so bf16 carries rounded back to bit-identical
buffers and the async tunnel memoized the "timed" dispatch against the
warmup. These tests pin the fix: a perturbed tree must be bit-different
from the original for EVERY float dtype the pipeline uses, including
half dtypes — this is the property the whole measurement methodology
(CLAUDE.md "Performance rules") rests on.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.utils import benchlib


FLOAT_DTYPES = [jnp.bfloat16, jnp.float16, jnp.float32, jnp.float64]


@pytest.mark.parametrize("dtype", FLOAT_DTYPES)
def test_perturb_is_bitwise_different(dtype):
    """Every non-zero leaf must change bit pattern after _perturb."""
    rng = np.random.RandomState(0)
    # span many binades, both signs, incl. large magnitudes
    vals = rng.randn(4096).astype(np.float32) * np.logspace(
        -3, 3, 4096).astype(np.float32)
    x = jnp.asarray(vals).astype(dtype)
    y = benchlib._perturb(x)
    assert y.dtype == x.dtype
    # compare raw bytes: any rounding-to-identity shows here
    xa, ya = np.asarray(x), np.asarray(y)
    same = xa.view(np.uint16 if xa.dtype.itemsize == 2 else
                   np.uint32 if xa.dtype.itemsize == 4 else
                   np.uint64) == ya.view(
                       np.uint16 if ya.dtype.itemsize == 2 else
                       np.uint32 if ya.dtype.itemsize == 4 else np.uint64)
    nonzero = xa.astype(np.float64) != 0.0
    assert not np.any(same & nonzero), (
        f"{dtype}: {np.sum(same & nonzero)} non-zero leaves perturbed to "
        "bit-identical values — the tunnel would memoize this dispatch")


@pytest.mark.parametrize("dtype", FLOAT_DTYPES)
def test_perturb_bf16_realistic_carry(dtype):
    """The exact round-2 failure shape: an activation-scale carry."""
    x = (jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 18))
         .astype(dtype))
    y = benchlib._perturb(x)
    assert not np.array_equal(
        np.asarray(x, np.float64), np.asarray(y, np.float64)), (
        f"{dtype} carry perturbed to numerically identical tree")


def test_perturb_trees_and_ints():
    """Non-float leaves (PRNG keys, uint8 images) pass through unchanged;
    structure is preserved."""
    tree = {"img": jnp.arange(12, dtype=jnp.uint8).reshape(3, 4),
            "key": jax.random.PRNGKey(0),
            "x": jnp.ones((3,), jnp.bfloat16)}
    out = benchlib._perturb(tree)
    assert np.array_equal(np.asarray(out["img"]), np.asarray(tree["img"]))
    assert np.array_equal(np.asarray(out["key"]), np.asarray(tree["key"]))
    assert not np.array_equal(np.asarray(out["x"], np.float32),
                              np.asarray(tree["x"], np.float32))


def test_perturb_preserves_compute_envelope():
    """The perturbation must not change shapes/dtypes (same executable)."""
    tree = (jnp.zeros((5, 7), jnp.bfloat16), jnp.ones((2,), jnp.float32))
    out = benchlib._perturb(tree)
    assert out[0].shape == (5, 7) and out[0].dtype == jnp.bfloat16
    assert out[1].shape == (2,) and out[1].dtype == jnp.float32
