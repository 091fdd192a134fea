"""Micro-benchmarks for the FCN forward's stages and layout candidates.

Times individual backbone/decoder pieces and alternative conv layouts
(NHWC vs channel-major NCHW with w on lanes) with the chained-scan method
(see CLAUDE.md "Performance rules"). Used to direct the decoder
optimization work; run on TPU.

  python tools/bench_decoder.py [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np



from pvnet_tpu.utils.benchlib import timeit_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()

    b = args.batch
    rng = np.random.RandomState(0)
    results = {}

    def bench_conv_nhwc(name, h, w, cin, cout, kernel=3):
        w_k = jnp.asarray(rng.randn(kernel, kernel, cin, cout) * 0.05,
                          jnp.bfloat16)
        x0 = jnp.asarray(rng.randn(b, h, w, cin), jnp.bfloat16)

        def step(x):
            y = jax.lax.conv_general_dilated(
                x, w_k, (1, 1), [(1, 1), (1, 1)] if kernel == 3 else
                [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            # keep shape for the carry: project back to cin with a 1x1
            return x + y[..., :1].astype(x.dtype) * jnp.bfloat16(1e-6)

        t = timeit_chained(step, x0, args.iters)
        gf = b * h * w * cin * cout * kernel * kernel * 2 / 1e9
        results[name] = (t, gf)
        print(f"{name:42s} {t*1e3:8.3f} ms  {gf/t/1e3:7.1f} TF/s")

    def bench_conv_cmajor(name, h, w, cin, cout, kernel=3):
        """lax.conv with NCHW in/out (w on lanes; w % 128 == 0 ideal)."""
        w_k = jnp.asarray(rng.randn(cout, cin, kernel, kernel) * 0.05,
                          jnp.bfloat16)
        x0 = jnp.asarray(rng.randn(b, cin, h, w), jnp.bfloat16)

        def step(x):
            y = jax.lax.conv_general_dilated(
                x, w_k, (1, 1), [(1, 1), (1, 1)] if kernel == 3 else
                [(0, 0), (0, 0)],
                dimension_numbers=("NCHW", "OIHW", "NCHW"))
            return x + y[:, :1].astype(x.dtype) * jnp.bfloat16(1e-6)

        t = timeit_chained(step, x0, args.iters)
        gf = b * h * w * cin * cout * kernel * kernel * 2 / 1e9
        results[name] = (t, gf)
        print(f"{name:42s} {t*1e3:8.3f} ms  {gf/t/1e3:7.1f} TF/s")

    def bench_backbone(name, dtype):
        from pvnet_tpu.models.resnet import resnet18_backbone
        bb = resnet18_backbone(dtype=dtype)
        x0 = jnp.asarray(rng.randn(b, 480, 640, 3), jnp.float32)
        v = bb.init(jax.random.PRNGKey(0), x0[:1], train=False)

        def step(x):
            outs = bb.apply(v, x, train=False)
            return x + outs[-1].astype(jnp.float32).mean() * 1e-9

        t = timeit_chained(step, x0, args.iters)
        results[name] = (t, 0)
        print(f"{name:42s} {t*1e3:8.3f} ms")

    print(f"batch={b}  (decoder stage shapes at 480x640 input)")
    bench_backbone("backbone_resnet18_8s_bf16", jnp.bfloat16)
    # decoder stages, NHWC (the current path)
    bench_conv_nhwc("conv8s  NHWC 60x80   384+128->128", 60, 80, 512, 128)
    bench_conv_nhwc("conv4s  NHWC 120x160 128+64->64", 120, 160, 192, 64)
    bench_conv_nhwc("conv2s  NHWC 240x320 64+64->32", 240, 320, 128, 32)
    bench_conv_nhwc("convraw NHWC 480x640 35->32", 480, 640, 35, 32)
    bench_conv_nhwc("convraw NHWC 480x640 64->32 (padded)", 480, 640, 64, 32)
    # channel-major alternatives (w % 128 == 0 at 640/320; 160 padded)
    bench_conv_cmajor("conv4s  NCHW 120x160 192->64", 120, 160, 192, 64)
    bench_conv_cmajor("conv2s  NCHW 240x320 128->32", 240, 320, 128, 32)
    bench_conv_cmajor("convraw NCHW 480x640 64->32", 480, 640, 64, 32)
    # s2d-packed full-res stage: half res, 4x channels, one aligned conv
    bench_conv_nhwc("convraw s2d NHWC 240x320 256->128", 240, 320, 256, 128)
    # upsample matmul cost reference
    from pvnet_tpu.models.pvnet import upsample_bilinear_align_corners

    def up_step(x):
        y = upsample_bilinear_align_corners(x, 480, 640)
        return x + y[:, :240, :320, :1].astype(x.dtype) * jnp.bfloat16(1e-6)

    x0 = jnp.asarray(rng.randn(b, 240, 320, 32), jnp.bfloat16)
    t = timeit_chained(up_step, x0, args.iters)
    print(f"{'upsample 2s->raw NHWC c32':42s} {t*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
