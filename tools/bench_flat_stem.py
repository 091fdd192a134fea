"""Microbench: stem conv1 on a w*c-flattened input vs plain conv7.

Hypothesis (CLAUDE.md layout rules): the 3-channel image is lane-padded
in HBM, so conv7 runs ~2.3 TF/s. Flattening (w, c) -> w*3 on the HOST
(free) gives a dense 1920-wide minor dim; conv1 becomes an exact-math
[7, 21, 1, 64] conv with stride (2, 6) and padding ((3, 3), (9, 9)):
window element index e = 3*kw + c maps each full-res tap (kw, c) to one
flattened tap, so kernel.reshape(7, 21, 1, 64) computes identical sums.

  python tools/bench_flat_stem.py [--batch 16]
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
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--check", action="store_true",
                    help="numeric parity check on CPU-sized shapes")
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from pvnet_tpu.utils.benchlib import timeit_chained

    b, h, w = args.batch, 480, 640
    rng = np.random.RandomState(0)
    img = rng.randn(b, h, w, 3).astype(np.float32)
    w7 = rng.randn(7, 7, 3, 64).astype(np.float32) * 0.05
    wf = w7.reshape(7, 21, 1, 64)

    dn = lax.conv_dimension_numbers((b, h, w, 3), (7, 7, 3, 64),
                                    ("NHWC", "HWIO", "NHWC"))

    def conv7(x):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), jnp.asarray(w7, jnp.bfloat16),
            (2, 2), [(3, 3), (3, 3)], dimension_numbers=dn)

    dnf = lax.conv_dimension_numbers((b, h, w * 3, 1), (7, 21, 1, 64),
                                     ("NHWC", "HWIO", "NHWC"))

    def convf(x):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), jnp.asarray(wf, jnp.bfloat16),
            (2, 6), [(3, 3), (9, 9)], dimension_numbers=dnf)

    if args.check:
        a = np.asarray(jax.jit(conv7)(jnp.asarray(img)), np.float32)
        bb = np.asarray(
            jax.jit(convf)(jnp.asarray(img.reshape(b, h, w * 3, 1))),
            np.float32)
        err = np.abs(a - bb).max()
        print(f"parity max|diff| = {err:.3e}")
        assert err < 1e-2

    flops = 2.0 * b * (h // 2) * (w // 2) * 147 * 64

    x3 = jnp.asarray(img)
    t = timeit_chained(
        lambda x: x + conv7(x).astype(jnp.float32).mean() * 1e-12,
        x3, args.iters)
    print(f"conv7  [b,{h},{w},3]:      {t*1e3:8.2f} ms "
          f"({flops/t/1e12:6.1f} TF/s)", flush=True)

    xf = jnp.asarray(img.reshape(b, h, w * 3, 1))
    t = timeit_chained(
        lambda x: x + convf(x).astype(jnp.float32).mean() * 1e-12,
        xf, args.iters)
    print(f"convf  [b,{h},{w*3},1]:    {t*1e3:8.2f} ms "
          f"({flops/t/1e12:6.1f} TF/s)", flush=True)

    # uint8-input variant: normalize fused in-graph on the dense layout
    u8 = (rng.rand(b, h, w * 3, 1) * 255).astype(np.uint8)
    mean = np.tile(np.array([0.485, 0.456, 0.406], np.float32), w)
    std = np.tile(np.array([0.229, 0.224, 0.225], np.float32), w)
    mean_j = jnp.asarray(mean)[None, None, :, None]
    std_j = jnp.asarray(std)[None, None, :, None]

    def convf_u8(x):
        xn = (x.astype(jnp.float32) / 255.0 - mean_j) / std_j
        return convf(xn)

    xu = jnp.asarray(u8)
    t = timeit_chained(
        lambda x: x + (convf_u8(x).astype(jnp.float32).mean()
                       * 1e-12).astype(x.dtype), xu, args.iters)
    print(f"convf+norm uint8 in:       {t*1e3:8.2f} ms "
          f"({flops/t/1e12:6.1f} TF/s)", flush=True)


if __name__ == "__main__":
    main()
