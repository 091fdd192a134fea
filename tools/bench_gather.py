"""Microbench: what does a random gather actually cost on this backend?

The device-aug warp is gather-bound (b16 480x640: warp 227 ms f32 /
211 ms packed-u32 — the 10% delta says per-index overhead dominates, not
bytes). This times the primitive in isolation to calibrate designs:

  flat-u32   4 taps x [b, h*w] u32 from a dense 1D plane (the packed warp)
  flat-f32x3 4 taps x [b, h*w, 3] f32 (the original warp's source layout)
  row        per-row shift: [b, h, w] gathered as [b*h] row-level dynamic
             slices expressed as take_along_axis on a [b,h,w+pad] array
             (the 2-pass shear decomposition's only non-static indexing)

  python tools/bench_gather.py --pieces u32,f32x3,row
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pieces", default="u32,f32x3,row")
    args = ap.parse_args()
    pieces = set(args.pieces.split(","))

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.utils.benchlib import timeit_chained

    b, h, w = args.batch, args.height, args.width
    n = h * w
    rng = np.random.RandomState(5)
    key = jax.random.PRNGKey(1)

    if "u32" in pieces:
        src = jnp.asarray(rng.randint(0, 2**31, (b, n), np.int64)
                          .astype(np.uint32))

        def u32_step(carry):
            acc, k = carry
            kk = jax.random.fold_in(k, acc.astype(jnp.int32))
            out = acc
            for t in range(4):
                idx = jax.random.randint(jax.random.fold_in(kk, t),
                                         (b, n), 0, n)
                g = jnp.take_along_axis(src, idx, axis=1)
                out = out + g.astype(jnp.float32).mean() * 1e-9
            return (out + 1.0, k)
        t = timeit_chained(u32_step, (jnp.float32(1.0), key), args.iters)
        print(f"u32 4-tap gather [b,{n}]: {t * 1e3:.2f} ms", flush=True)

    if "f32x3" in pieces:
        src3 = jnp.asarray(rng.rand(b, n, 3).astype(np.float32))

        def f32_step(carry):
            acc, k = carry
            kk = jax.random.fold_in(k, acc.astype(jnp.int32))
            out = acc
            for t in range(4):
                idx = jax.random.randint(jax.random.fold_in(kk, t),
                                         (b, n), 0, n)
                g = jnp.take_along_axis(src3, idx[..., None], axis=1)
                out = out + g.mean() * 1e-9
            return (out + 1.0, k)
        t = timeit_chained(f32_step, (jnp.float32(1.0), key), args.iters)
        print(f"f32x3 4-tap gather [b,{n},3]: {t * 1e3:.2f} ms", flush=True)

    if "row" in pieces:
        pad = 256
        srcr = jnp.asarray(rng.rand(b, h, w + pad).astype(np.float32))

        def row_step(carry):
            acc, k = carry
            kk = jax.random.fold_in(k, acc.astype(jnp.int32))
            sh = jax.random.randint(kk, (b, h), 0, pad)     # per-row shift
            idx = sh[..., None] + jnp.arange(w)[None, None, :]
            g = jnp.take_along_axis(srcr, idx, axis=2)
            return (acc + 1.0 + g.mean() * 1e-9, k)
        t = timeit_chained(row_step, (jnp.float32(1.0), key), args.iters)
        print(f"row-shift take_along_axis [b,{h},{w}]: {t * 1e3:.2f} ms",
              flush=True)


if __name__ == "__main__":
    main()
