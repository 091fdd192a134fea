"""Canonical chained-scan timing for the async TPU tunnel.

CLAUDE.md "Performance rules": the tunnel memoizes/elides repeated
identical dispatches, so honest timing needs BOTH (1) a lax.scan whose
carry data-depends on every step (defeats intra-program elision) and
(2) a *different* input for the timed call than the warmup call
(defeats whole-dispatch memoization). Every bench/profile tool imports
from here — do not re-implement locally; the copies diverged once
already in exactly property (2).
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp


def _perturb(tree):
    """New buffers, float leaves scaled by (1 + 1e-6): a distinct dispatch
    with numerically equivalent work."""
    def f(t):
        t = jnp.asarray(t)
        if jnp.issubdtype(t.dtype, jnp.floating):
            return (t * (1 + 1e-6)).astype(t.dtype)
        return t
    return jax.tree.map(f, tree)


def timeit_chained(step_fn, init_carry, iters: int = 10) -> float:
    """Mean seconds/step of ``step_fn``: carry -> carry.

    The step function itself must thread real data through its carry
    (e.g. fold a scalar of its output into the next input) so the scan
    steps cannot be elided."""
    @jax.jit
    def run(carry):
        out, _ = jax.lax.scan(lambda c, _: (step_fn(c), None), carry,
                              None, length=iters)
        return out

    jax.block_until_ready(run(init_carry))              # compile + warm
    timed = _perturb(init_carry)
    t0 = time.perf_counter()
    jax.block_until_ready(run(timed))
    return (time.perf_counter() - t0) / iters


def timeit_op(op, x, iters: int = 20) -> float:
    """Mean seconds/call of ``op``: x -> y (any output shape).

    Chaining is injected here: each step rescales the input by
    1 + 1e-12 * mean(y), so step k+1 data-depends on step k's output
    without changing the measured computation."""
    @jax.jit
    def run(x0):
        def body(c, _):
            y = op(c)
            s = 1 + 1e-12 * y.astype(jnp.float32).mean()
            return (c * s).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    jax.block_until_ready(run(x))
    t0 = time.perf_counter()
    jax.block_until_ready(run(_perturb(x)))
    return (time.perf_counter() - t0) / iters
