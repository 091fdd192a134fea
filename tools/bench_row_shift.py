"""Microbench: the Pallas circular row/column shift kernels vs the XLA
windowed take_along_axis they replace (tools/bench_gather.py --pieces row
measured that at 68.6 ms for [16, 480, 640] f32).

Measured (real TPU, 2026-08, includes per-iter randint start generation):
  shift_lanes    [64, 480, 640] f32: 5.82 ms
  shift_sublanes [64, 480, 640] f32: 3.49 ms

  python tools/bench_row_shift.py --pieces lanes,sublanes
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--planes", type=int, default=64)   # b16 x 4 channels
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--pieces", default="lanes,sublanes")
    args = ap.parse_args()
    pieces = set(args.pieces.split(","))

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.utils.benchlib import timeit_chained
    from pvnet_tpu.ops.row_shift import shift_lanes, shift_sublanes

    P, H, W = args.planes, args.height, args.width
    rng = np.random.RandomState(5)
    x = jnp.asarray(rng.rand(P, H, W).astype(np.float32))
    key = jax.random.PRNGKey(1)

    if "lanes" in pieces:
        def step(carry):
            acc, k = carry
            kk = jax.random.fold_in(k, acc.astype(jnp.int32))
            s = jax.random.randint(kk, (P, H), 0, W)
            y = shift_lanes(x, s)
            return (acc + 1.0 + y.mean() * 1e-9, k)
        t = timeit_chained(step, (jnp.float32(1.0), key), args.iters)
        print(f"shift_lanes [P={P},{H},{W}]: {t * 1e3:.2f} ms", flush=True)

    if "sublanes" in pieces:
        def step(carry):
            acc, k = carry
            kk = jax.random.fold_in(k, acc.astype(jnp.int32))
            s = jax.random.randint(kk, (P, W), 0, H)
            y = shift_sublanes(x, s)
            return (acc + 1.0 + y.mean() * 1e-9, k)
        t = timeit_chained(step, (jnp.float32(1.0), key), args.iters)
        print(f"shift_sublanes [P={P},{H},{W}]: {t * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
