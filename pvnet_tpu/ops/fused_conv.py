"""Fused 3x3 convolution + affine + leaky-ReLU as a Pallas TPU kernel.

Why this exists: XLA's TPU convolution runs the PVNet decoder's low-channel
3x3 convs far below both the MXU and HBM rooflines (chained-scan timing:
18-25 TF/s on v5e for the 2s/4s stages at batch 16 — small output channels
waste MXU result lanes and T(8,128)-tiled HBM layouts lane-pad the
activations). This kernel reformulates the conv with **output
space-to-depth packing**: each 2x2 block of output pixels is computed
together, so the matmul's N dimension becomes 4*cout (= 128 for the
decoder stage) and the contraction is a 16-tap K-packed im2col built in
VMEM. The packed form is mathematically identical to the plain conv:

    out[b, 2i+a, 2j+c, o] = packed[b, i, j, (a*2+c)*cout + o]

The 16 taps are the 4x4 input window covering all four output-pixel
positions of the cell; each output position uses 9 of them, so the packed
weight matrix [16*cin, 4*cout] carries 16/9 the FLOPs of the plain conv —
a price worth paying for full MXU lane utilization.

Corresponds to the reference's decoder convs (ref
lib/networks/model_repository.py:30-58: conv8s/conv4s/conv2s/convraw =
Conv2d + BN + LeakyReLU(0.1)); at inference the BN collapses into the
affine (scale, bias) fused here.

Constraints (the kernel is a fast path, not a general conv):
  - NHWC bfloat16 input, even H and W,
  - cin a multiple of 64 (so the paired-column channel dim 2*cin is
    lane-aligned at 128),
  - stride 1, dilation 1, 'SAME' padding — the PVNet decoder shape.
Anything else should use the plain XLA conv.

Status: measured 0.7-0.9x of XLA's conv on the decoder stages — the
16 shifted VMEM im2col copies (sublane offsets + half-lane selects)
dominate and cap the matmul. Kept as the basis of the fused inference
tail (ops/tail_kernel.py, also experimental) and for a future
direct-accumulation rewrite; see CLAUDE.md "Performance rules" for the
measurement methodology.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rpo(p: int) -> int:
    """Pair-row offset of window-row tap p relative to output-cell row - 1."""
    return (p + 1) // 2


def _rpar(p: int) -> int:
    """Row parity of window-row tap p within its pair-row."""
    return (p + 1) % 2


def pack_conv3x3_weights(w: jnp.ndarray) -> jnp.ndarray:
    """[3, 3, cin, cout] -> [16*cin, 4*cout] packed matrix.

    W[(p*4+q)*cin + k, (a*2+c)*cout + o] = w[p-a, q-c, k, o] for tap rows
    p, cols q in 0..3 and output parities a, c in 0..1 (zero outside the
    3x3 support). Differentiable (pure gather/pad), so the packed conv can
    also back a training step if ever needed.
    """
    _, _, cin, cout = w.shape
    blocks = []
    for p in range(4):
        for q in range(4):
            row = []
            for a in range(2):
                for c in range(2):
                    dy, dx = p - a, q - c
                    if 0 <= dy <= 2 and 0 <= dx <= 2:
                        row.append(w[dy, dx])
                    else:
                        row.append(jnp.zeros_like(w[0, 0]))
            blocks.append(jnp.concatenate(row, axis=-1))    # [cin, 4cout]
    return jnp.concatenate(blocks, axis=0)                  # [16cin, 4cout]


def _kernel(x_hbm, w_ref, sb_ref, out_ref, xbuf, imbuf, sem,
            *, RT, WP, CL, cin, cout4, n_tiles, n_b, alpha, has_affine):
    """Grid (B, n_tiles).

    x_hbm [B, HP+2, 2, WP, CL] — pair-row layout with one zero halo
    pair-row top and bottom (CL = 2*cin, lane-aligned).
    xbuf  [2, RT+2, 2, WP+16, CL] — double-buffered tile + 8-wide zero col
    halos (zeroed once; DMA only ever writes the interior).
    imbuf [RT, WP, 16*cin] — K-packed im2col.
    out block [1, RT, WP, cout4].
    """
    b = pl.program_id(0)
    t = pl.program_id(1)
    CP = WP + 16

    @pl.when((b == 0) & (t == 0))
    def _():
        xbuf[0, :, :, 0:8, :] = jnp.zeros_like(xbuf[0, :, :, 0:8, :])
        xbuf[0, :, :, CP - 8:CP, :] = jnp.zeros_like(
            xbuf[0, :, :, CP - 8:CP, :])
        xbuf[1, :, :, 0:8, :] = jnp.zeros_like(xbuf[1, :, :, 0:8, :])
        xbuf[1, :, :, CP - 8:CP, :] = jnp.zeros_like(
            xbuf[1, :, :, CP - 8:CP, :])

    def dma(bi, ti, slot):
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(ti * RT, RT + 2)],
            xbuf.at[slot, :, :, pl.ds(8, WP), :], sem.at[slot])

    @pl.when((b == 0) & (t == 0))
    def _():
        dma(0, 0, 0).start()

    slot = (b * n_tiles + t) % 2
    nxt_b = jnp.where(t == n_tiles - 1, b + 1, b)
    nxt_t = jnp.where(t == n_tiles - 1, 0, t + 1)

    @pl.when(nxt_b < n_b)
    def _():
        dma(nxt_b, nxt_t, 1 - slot).start()

    dma(b, t, slot).wait()

    # K-packed im2col: tap (p, q) of the 4x4 window -> block k = p*4 + q.
    for p in range(4):
        rpo, rpar = _rpo(p), _rpar(p)
        for q in range(4):
            cpo, cpar = (q + 1) // 2, (q + 1) % 2
            k = p * 4 + q
            imbuf[:, :, k * cin:(k + 1) * cin] = xbuf[
                slot, rpo:rpo + RT, rpar, 7 + cpo:7 + cpo + WP,
                cpar * cin:(cpar + 1) * cin]

    acc = jax.lax.dot_general(
        imbuf[...], w_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [RT, WP, cout4]
    if has_affine:
        acc = acc * sb_ref[0] + sb_ref[1]
    if alpha is not None:
        acc = jnp.where(acc >= 0, acc, jnp.float32(alpha) * acc)
    out_ref[...] = acc[None].astype(out_ref.dtype)


def conv3x3_s2d_packed(x: jnp.ndarray, w_packed: jnp.ndarray,
                       scale: Optional[jnp.ndarray] = None,
                       bias: Optional[jnp.ndarray] = None,
                       alpha: Optional[float] = 0.1,
                       row_tile: int = 8,
                       out_dtype=jnp.bfloat16) -> jnp.ndarray:
    """Fused lrelu(scale * conv3x3(x, w) + bias), s2d-packed output.

    Args:
      x: [B, H, W, cin] bfloat16; H, W even; cin % 64 == 0.
      w_packed: [16*cin, 4*cout] from pack_conv3x3_weights.
      scale, bias: optional [4*cout] fused affine (inference-folded BN) —
        build with jnp.tile(v, 4).
      alpha: leaky-ReLU slope (None = no activation, 0.0 = ReLU).
      row_tile: output cell rows per kernel step.

    Returns:
      [B, H/2, W/2, 4*cout] packed output; unpack with depth_from_s2d.
    """
    B, H, W, cin = x.shape
    assert H % 2 == 0 and W % 2 == 0, (H, W)
    assert cin % 64 == 0, cin
    k16cin, cout4 = w_packed.shape
    assert k16cin == 16 * cin
    HP, WP = H // 2, W // 2
    CL = 2 * cin

    RT = row_tile
    while HP % RT:
        RT //= 2
    n_tiles = HP // RT

    # pair-row layout + one zero halo pair-row top/bottom (fused into the
    # producer copy by XLA where possible)
    xp = jnp.pad(x.reshape(B, HP, 2, WP, CL),
                 ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))

    has_affine = scale is not None
    if has_affine:
        sb = jnp.stack([scale, bias]).astype(jnp.float32)   # [2, 4cout]
    else:
        sb = jnp.zeros((2, cout4), jnp.float32)

    kern = functools.partial(
        _kernel, RT=RT, WP=WP, CL=CL, cin=cin, cout4=cout4,
        n_tiles=n_tiles, n_b=B, alpha=alpha, has_affine=has_affine)
    return pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, RT, WP, cout4), lambda b, t: (b, t, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, HP, WP, cout4), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, RT + 2, 2, WP + 16, CL), jnp.bfloat16),
            pltpu.VMEM((RT, WP, 16 * cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, w_packed.astype(jnp.bfloat16), sb)


def depth_from_s2d(packed: jnp.ndarray, cout: int) -> jnp.ndarray:
    """Unpack [B, HP, WP, 4*cout] -> [B, 2*HP, 2*WP, cout]."""
    B, HP, WP, _ = packed.shape
    y = packed.reshape(B, HP, WP, 2, 2, cout)
    return y.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * HP, 2 * WP, cout)


def fused_conv3x3_bn_lrelu(x: jnp.ndarray, w: jnp.ndarray,
                           scale: jnp.ndarray, bias: jnp.ndarray,
                           alpha: float = 0.1,
                           interpret_fallback: bool = True) -> jnp.ndarray:
    """Convenience wrapper: plain-layout in, plain-layout out.

    Computes lrelu(scale * conv3x3(x, w) + bias) with the packed kernel
    when the shape constraints hold and a TPU is the backend; otherwise
    falls back to the XLA reference path (same math).
    """
    B, H, W, cin = x.shape
    cout = w.shape[-1]
    eligible = (H % 2 == 0 and W % 2 == 0 and cin % 64 == 0
                and jax.default_backend() == "tpu")
    if not eligible:
        if not interpret_fallback:
            raise ValueError(f"shape not eligible for packed conv: {x.shape}")
        return conv3x3_bn_lrelu_ref(x, w, scale, bias, alpha)
    wp = pack_conv3x3_weights(w)
    packed = conv3x3_s2d_packed(
        x.astype(jnp.bfloat16), wp,
        jnp.tile(scale, 4), jnp.tile(bias, 4), alpha=alpha)
    return depth_from_s2d(packed, cout)


def conv3x3_bn_lrelu_ref(x, w, scale, bias, alpha: float = 0.1):
    """XLA reference of the fused op (used by tests and the fallback)."""
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(1, 1)] * 2, dimension_numbers=dn,
        preferred_element_type=jnp.float32)
    y = y * scale + bias
    return jnp.where(y >= 0, y, alpha * y)
