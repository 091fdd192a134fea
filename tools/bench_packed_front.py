"""Microbench: candidate packed-lattice forms of the backbone front.

The measured FCN stage profile (tools/bench_fcn_stages.py) shows conv1 /
layer1 / layer2 running at 5-16 TF/s — the small-channel lane-padding tax
(CLAUDE.md). A 2x2 space-to-depth packing turns layer1's 3x3 64ch convs at
120x160 into VALID 2x2 convs with 256 packed channels on a shifted 61x81
lattice (1.78x FLOPs, exact — same trick as ops/packed_tail.py), and
layer2's 128ch convs at 60x80 into 512-channel convs on 31x41. This bench
times the candidate conv shapes (plus the pack/unpack relayouts they
need) against the direct forms, so the packed-front rewrite is justified
by measurement before it is built.

Measured (v5e, b16, bf16): REFUTED for l1/l2 — the packed convs run at
only ~24-26 TF/s (1.65/1.57 ms), a wash with the direct forms (1.59/1.50
ms) before even paying the ~1.3 ms pack/unpack relayouts; these shapes
are not lane-padding-bound. conv1 DOES win: direct 7x7/2 8.6 ms vs
packed 4x4 12ch 3.3 ms (2.6x) — see models/resnet.py conv1 packing.

  python tools/bench_packed_front.py [--batch 16]
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



from pvnet_tpu.utils.benchlib import timeit_op as timeit_chained


def conv(x, w, stride=1, pad="SAME"):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (stride, stride), pad, dimension_numbers=dn)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    B = args.batch
    f = lambda *s: jnp.asarray(rng.randn(*s).astype(np.float32),
                               dtype=jnp.bfloat16)

    def report(name, ms, flops):
        print(f"{name:42s}: {ms*1e3:8.3f} ms ({flops/ms/1e12:6.1f} TF/s)")

    # --- layer1 candidates (4 convs of 3x3 64->64 @120x160 in the model)
    x = f(B, 120, 160, 64)
    w = f(3, 3, 64, 64)
    t = timeit_chained(lambda c: conv(c, w), x)
    report("l1 direct 3x3 64->64 @120x160", t, 2 * B * 120 * 160 * 9 * 64 * 64)

    xp = f(B, 61, 81, 256)
    wp = f(2, 2, 256, 256)
    t = timeit_chained(lambda c: conv(c, wp, pad="VALID"), xp)
    report("l1 packed VALID 2x2 256->256 @61x81", t,
           2 * B * 60 * 80 * 4 * 256 * 256)

    # --- layer2 candidates (3 convs of 3x3 128->128 @60x80)
    x2 = f(B, 60, 80, 128)
    w2 = f(3, 3, 128, 128)
    t = timeit_chained(lambda c: conv(c, w2), x2)
    report("l2 direct 3x3 128->128 @60x80", t, 2 * B * 60 * 80 * 9 * 128 * 128)

    xp2 = f(B, 31, 41, 512)
    wp2 = f(2, 2, 512, 512)
    t = timeit_chained(lambda c: conv(c, wp2, pad="VALID"), xp2)
    report("l2 packed VALID 2x2 512->512 @31x41", t,
           2 * B * 30 * 40 * 4 * 512 * 512)

    # --- stride-2 transitions on packed lattices
    # l2.0: 3x3/2 64->128 from 120x160 -> 60x80; packed: 2x2 VALID over
    # the 61x81/256 lattice emitting the unpacked 60x80x128 grid
    wt = f(2, 2, 256, 128)
    t = timeit_chained(lambda c: conv(c, wt, pad="VALID"), xp)
    report("l2.0 packed 2x2 256->128 @61x81 (s2 exit)", t,
           2 * B * 60 * 80 * 4 * 256 * 128)

    # --- pack/unpack relayout costs
    def pack(c):  # [B,120,160,64] -> [B,60,80,256]
        return c.reshape(B, 60, 2, 80, 2, 64).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, 60, 80, 256)
    t = timeit_chained(pack, x)
    report("pack s2d [120,160,64]->[60,80,256]", t, 1e3)

    def unpack(c):  # [B,60,80,256] -> [B,120,160,64]
        return c.reshape(B, 60, 80, 2, 2, 64).transpose(
            0, 1, 3, 2, 4, 5).reshape(B, 120, 160, 64)
    xq = f(B, 60, 80, 256)
    t = timeit_chained(unpack, xq)
    report("unpack [60,80,256]->[120,160,64]", t, 1e3)

    # --- conv1 candidates: 7x7/2 3->64 @480x640
    xi = f(B, 480, 640, 3)
    wi = f(7, 7, 3, 64)
    t = timeit_chained(lambda c: conv(c, wi, stride=2), xi)
    report("conv1 direct 7x7/2 3->64 @480x640", t,
           2 * B * 240 * 320 * 49 * 3 * 64)

    # packed input [240,320,12], conv1 as 4x4 conv (pad 2,1 per side)
    xip = f(B, 243, 323, 12)
    wip = f(4, 4, 12, 64)
    t = timeit_chained(lambda c: conv(c, wip, pad="VALID"), xip)
    report("conv1 packed 4x4 12->64 @243x323", t,
           2 * B * 240 * 320 * 16 * 12 * 64)

    # conv1 fully folded: im2col matmul [.,192]x[192,64] given packed input
    xfold = f(B, 240, 320, 192)
    wfold = f(192, 64)
    t = timeit_chained(
        lambda c: jnp.einsum("bhwk,ko->bhwo", c, wfold.astype(c.dtype)),
        xfold)
    report("conv1 im2col matmul 192->64 @240x320", t,
           2 * B * 240 * 320 * 192 * 64)


if __name__ == "__main__":
    main()
