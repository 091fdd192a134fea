"""Microbench: int8 vs bf16 conv on the backbone's dominant shapes.

TPU v5e peak is ~2x bf16 for int8 MXU ops. layer3/layer4 (dilated 3x3,
256/512 ch at 60x80) are ~112 of the backbone's ~130 GF/img — if XLA
lowers int8 convs onto the int8 MXU path, post-training quantization of
those stages is the main remaining throughput lever (backbone already
runs at ~94% of bf16 roofline, CLAUDE.md).

  python tools/bench_int8_conv.py [--batch 128]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import lax
    from pvnet_tpu.utils.benchlib import timeit_chained

    b = args.batch
    rng = np.random.RandomState(0)

    for c, dil in ((256, 2), (512, 4)):
        h, w = 60, 80
        x = rng.randn(b, h, w, c).astype(np.float32)
        k = (rng.randn(3, 3, c, c) * 0.05).astype(np.float32)
        dn = lax.conv_dimension_numbers((b, h, w, c), (3, 3, c, c),
                                        ("NHWC", "HWIO", "NHWC"))
        flops = 2.0 * b * h * w * 9 * c * c

        def conv_bf16(xx, kk=jnp.asarray(k, jnp.bfloat16), d=dil, dd=dn):
            return lax.conv_general_dilated(
                xx.astype(jnp.bfloat16), kk, (1, 1), [(d, d), (d, d)],
                rhs_dilation=(d, d), dimension_numbers=dd)

        t = timeit_chained(
            lambda xx: xx + conv_bf16(xx).astype(jnp.float32).mean()
            * 1e-12, jnp.asarray(x), args.iters)
        print(f"bf16 c={c} dil={dil}: {t*1e3:8.2f} ms "
              f"({flops/t/1e12:6.1f} TF/s)", flush=True)

        xi = np.clip(np.round(x * 16), -127, 127).astype(np.int8)
        ki = np.clip(np.round(k * 512), -127, 127).astype(np.int8)

        def conv_i8(xx, kk=jnp.asarray(ki), d=dil, dd=dn):
            return lax.conv_general_dilated(
                xx, kk, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=dd,
                preferred_element_type=jnp.int32)

        t = timeit_chained(
            lambda xx: xx + (conv_i8(xx).astype(jnp.float32).mean()
                             * 1e-12).astype(jnp.int8),
            jnp.asarray(xi), args.iters)
        print(f"int8 c={c} dil={dil}: {t*1e3:8.2f} ms "
              f"({flops/t/1e12:6.1f} TOP/s)", flush=True)

        # int8 with bf16 activations quantized in-graph (realistic PTQ:
        # weights live as int8, activations quantized per-tensor on entry,
        # output dequantized)
        scale = jnp.float32(16.0)

        def conv_i8_dyn(xx, kk=jnp.asarray(ki), d=dil, dd=dn):
            q = jnp.clip(jnp.round(xx.astype(jnp.float32) * scale),
                         -127, 127).astype(jnp.int8)
            y = lax.conv_general_dilated(
                q, kk, (1, 1), [(d, d), (d, d)], rhs_dilation=(d, d),
                dimension_numbers=dd, preferred_element_type=jnp.int32)
            return y.astype(jnp.float32) * (1.0 / (16.0 * 512.0))

        t = timeit_chained(
            lambda xx: xx + (conv_i8_dyn(xx).mean() * 1e-12
                             ).astype(xx.dtype),
            jnp.asarray(x, jnp.bfloat16), args.iters)
        print(f"int8+q/dq c={c} dil={dil}: {t*1e3:8.2f} ms "
              f"({flops/t/1e12:6.1f} TOP/s)", flush=True)


if __name__ == "__main__":
    main()
