"""Per-stage timing of the PVNet FCN's convolutions on TPU (bf16, chained
scan timing). Locates which convs pay the small-channel lane-padding tax.

  python tools/bench_fcn_stages.py [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(step_fn, x, iters=20):
    @jax.jit
    def run(x0):
        def body(c, _):
            y = step_fn(c)
            s = 1 + 1e-12 * y.astype(jnp.float32).mean()
            return (c * s).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    out = run(x)
    jax.block_until_ready(out)
    perturbed = jax.tree.map(
        lambda t: t * (1 + 1e-6) if jnp.issubdtype(t.dtype, jnp.floating)
        else t, x)
    t0 = time.perf_counter()
    out = run(perturbed)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv(x, w, stride=1, dil=1):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    pad = dil * (w.shape[0] // 2)
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), [(pad, pad)] * 2,
        rhs_dilation=(dil, dil), dimension_numbers=dn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    B = args.batch
    # (label, H, W, cin, cout, k, stride, dil)
    stages = [
        ("conv1 7x7/2 3->64 @480x640", 480, 640, 3, 64, 7, 2, 1),
        ("l1 3x3 64->64 @120x160", 120, 160, 64, 64, 3, 1, 1),
        ("l2 3x3 128->128 @60x80", 60, 80, 128, 128, 3, 1, 1),
        ("l3 3x3 256->256 d2 @60x80", 60, 80, 256, 256, 3, 1, 2),
        ("l4 3x3 512->512 d4 @60x80", 60, 80, 512, 512, 3, 1, 4),
        ("fc 3x3 512->256 @60x80", 60, 80, 512, 256, 3, 1, 1),
        ("8s 3x3 384->128 @60x80", 60, 80, 384, 128, 3, 1, 1),
        ("4s 3x3 192->64 @120x160", 120, 160, 192, 64, 3, 1, 1),
        ("2s 3x3 128->32 @240x320", 240, 320, 128, 32, 3, 1, 1),
        ("raw 3x3 35->32 @480x640", 480, 640, 35, 32, 3, 1, 1),
    ]
    total = 0.0
    print(f"batch={B} backend={jax.default_backend()} dtype=bf16")
    for label, H, W, cin, cout, k, st, dil in stages:
        x = jnp.asarray(rng.randn(B, H, W, cin) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(k, k, cin, cout) * 0.05, jnp.float32)
        t = timeit_chained(lambda c: conv(c, w, st, dil), x)
        flops = 2 * B * (H // st) * (W // st) * k * k * cin * cout
        total += t
        print(f"{label:30s}: {t*1e3:7.3f} ms ({flops/t/1e12:6.1f} TF/s)")
    print(f"{'sum of measured convs':30s}: {total*1e3:7.3f} ms")

    # upsample einsums (align-corners as two matmuls)
    from pvnet_tpu.models.pvnet import upsample_bilinear_align_corners
    for label, H, W, C in [("up 60x80->120x160 c128", 60, 80, 128),
                           ("up 120x160->240x320 c64", 120, 160, 64),
                           ("up 240x320->480x640 c32", 240, 320, 32)]:
        x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)
        t = timeit_chained(
            lambda c: upsample_bilinear_align_corners(c, 2 * c.shape[1],
                                                      2 * c.shape[2]), x)
        print(f"{label:30s}: {t*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
