"""Shared chained-scan timing helpers (utils/benchlib.py)."""
import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.utils.benchlib import _perturb, timeit_chained, timeit_op


def test_timeit_chained_runs():
    t = timeit_chained(lambda c: c * 1.0000001, jnp.ones((8, 8)), iters=3)
    assert t > 0


def test_timeit_chained_pytree_carry():
    carry = (jnp.ones((4, 4)), jax.random.PRNGKey(0))

    def step(c):
        x, k = c
        return x + 1e-9, jax.random.fold_in(k, 0)

    assert timeit_chained(step, carry, iters=2) > 0


def test_timeit_op_output_shape_differs():
    # op output need not match input shape; chaining still works
    t = timeit_op(lambda x: x.sum(axis=1), jnp.ones((8, 16)), iters=3)
    assert t > 0


def test_perturb_makes_new_float_buffers_keeps_ints():
    x = {"f": jnp.ones((3,), jnp.float32), "i": jnp.arange(3, dtype=jnp.int32)}
    p = _perturb(x)
    assert not np.array_equal(np.asarray(p["f"]), np.asarray(x["f"]))
    assert np.array_equal(np.asarray(p["i"]), np.asarray(x["i"]))
