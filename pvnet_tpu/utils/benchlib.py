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


# Perturbation scale per dtype: must exceed the dtype's relative ULP by a
# comfortable margin or the multiply rounds back to bit-identical values
# and the tunnel memoizes the "timed" dispatch against the warmup one.
# Round 2 shipped exactly that bug: 1e-6 is ~260x BELOW the bf16 ULP
# (2^-8 relative), so bf16 carries (the voting stage's vertex field) were
# perturbed to identity and BENCH_r02 recorded 0.08 ms for a 16 ms stage.
_PERTURB_EPS = {
    jnp.dtype(jnp.bfloat16): 2.0 ** -6,   # ULP 2^-8  -> 4x margin
    jnp.dtype(jnp.float16): 2.0 ** -9,    # ULP 2^-11 -> 4x margin
}


def _perturb(tree):
    """New buffers, float leaves scaled by (1 + eps(dtype)): a distinct
    dispatch with a numerically equivalent compute envelope.

    eps is dtype-aware (see _PERTURB_EPS); half dtypes scale in f32 so the
    bump itself is exact before the final rounding cast. Guaranteed
    bit-different for any non-zero finite leaf value
    (tests/test_benchlib.py)."""
    def f(t):
        t = jnp.asarray(t)
        if jnp.issubdtype(t.dtype, jnp.floating):
            eps = _PERTURB_EPS.get(jnp.dtype(t.dtype), 1e-6)
            if t.dtype.itemsize < 4:
                y = (t.astype(jnp.float32) * (1.0 + eps)).astype(t.dtype)
            else:
                y = (t * (1.0 + eps)).astype(t.dtype)
            # subnormal spacing is absolute, so the multiplicative bump can
            # round back to identity there; step one representable value
            # away from zero instead (smallest_subnormal = 1 ULP at 0)
            tiny = jnp.asarray(jnp.finfo(t.dtype).smallest_subnormal,
                               t.dtype)
            stuck = (y == t) & (t != 0)
            return jnp.where(stuck, t + jnp.where(t > 0, tiny, -tiny), y)
        return t
    return jax.tree.map(f, tree)


def timeit_chained(step_fn, init_carry, iters: int = 10) -> float:
    """Mean seconds/step of ``step_fn``: carry -> carry.

    TWO requirements on the step function, both load-bearing:
    1. It must thread real data through its carry (e.g. fold a scalar of
       its output into the next input) so consecutive steps are chained.
    2. EVERY expensive input must data-depend on the carry. XLA runs
       loop-invariant code motion on the compiled while loop: a heavy
       computation whose operands don't change across steps is hoisted
       and computed ONCE (measured: a pose pipeline timed with a
       loop-invariant image reported fcn_cost/iters — 2.5x fantasy
       throughput). For an invariant tensor input, derive a per-step
       variant from the carry, e.g. ``jnp.roll(x, acc.astype(int32) %
       x.shape[0], axis=0)`` — identical compute, unhoistable."""
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
