"""Fused PVNet inference tail: raw conv + BN + LeakyReLU + 1x1 head as one
s2d-packed Pallas kernel.

The reference tail (ref lib/networks/model_repository.py:53-58 — convraw =
Conv3x3(35->32) + BN + LeakyReLU followed by the 1x1 seg+ver head) runs at
full 480x640 resolution on 35/32-channel tensors. On TPU, T(8,128)-tiled
HBM layouts pad those channel dims to 128 lanes, so XLA's conv pays ~4x
its useful bandwidth — measured ~10 ms of a 37 ms forward at batch 16.

This kernel reuses the output space-to-depth packing of ops/fused_conv.py
(2x2 output cells packed into depth, 16-tap K-packed im2col in VMEM) and
extends it through the head:

    packed  = lrelu(conv3x3(x) * scale + bias)            # [.., 4*32]
    out     = packed @ blockdiag(W_head) + b_head          # [.., 4*20]
    fgcnt   = #cells with seg1 > seg0 (foreground count)   # [.., 1]

Every tensor it touches is 128-lane aligned; the full-resolution seg/ver
fields are never materialized — downstream foreground selection consumes
the packed field directly (voting.sample_foreground_packed). Inference
only: BN is folded into (scale, bias) by fold_tail_params.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvnet_tpu.ops.fused_conv import _rpo, _rpar, pack_conv3x3_weights


class TailParams(NamedTuple):
    """Folded inference parameters of the fused tail."""
    w_packed: jnp.ndarray    # [16*cin, 4*cout] packed raw-conv weights
    scale4: jnp.ndarray      # [4*cout] folded BN scale (tiled 4)
    bias4: jnp.ndarray       # [4*cout] folded BN bias (tiled 4)
    w_head: jnp.ndarray      # [4*cout, 4*hout] block-diagonal head weights
    b_head: jnp.ndarray      # [4*hout] head bias (tiled 4)
    w_fg: jnp.ndarray        # [4*hout, 8] per-cell (seg1 - seg0) extractor


def fold_tail_params(w_raw, bn_scale, bn_bias, bn_mean, bn_var,
                     w_head, b_head, cin_pad: int = 64, eps: float = 1e-5,
                     seg_dim: int = 2) -> TailParams:
    """Fold train-form parameters into the kernel's inference form.

    Pure jnp (jit-safe — the pipeline folds inside the compiled step; the
    fold is a handful of tiny reshapes/matmuls).

    Args:
      w_raw: [3, 3, cin, cout] raw-stage conv kernel (cin = 32 + 3 = 35).
      bn_*: the raw-stage BatchNorm's scale/bias/running mean/var [cout].
      w_head: [1, 1, cout, hout] or [cout, hout] head conv kernel.
      b_head: [hout] head bias.
      cin_pad: channel count the kernel input is zero-padded to (64 keeps
        the paired-column lane dim at 128).
    """
    w_raw = jnp.asarray(w_raw, jnp.float32)
    k, _, cin, cout = w_raw.shape
    assert k == 3 and cin <= cin_pad
    w_p = jnp.pad(w_raw, ((0, 0), (0, 0), (0, cin_pad - cin), (0, 0)))
    w_packed = pack_conv3x3_weights(w_p)                    # [16*cin_pad,4c]

    inv = jax.lax.rsqrt(jnp.asarray(bn_var, jnp.float32) + eps)
    scale = jnp.asarray(bn_scale, jnp.float32) * inv
    bias = (jnp.asarray(bn_bias, jnp.float32)
            - jnp.asarray(bn_mean, jnp.float32) * scale)

    wh = jnp.asarray(w_head, jnp.float32).reshape(cout, -1)
    hout = wh.shape[1]
    w_head_bd = jnp.kron(jnp.eye(4, dtype=jnp.float32), wh)  # [4c, 4h]

    # foreground = class 1 of 2 (ref train_linemod.py:99-102); the fixed
    # -seg0/+seg1 extractor below only supports that head layout
    assert seg_dim == 2, seg_dim
    w_fg = np.zeros((4 * hout, 8), np.float32)
    for p in range(4):
        w_fg[p * hout + 0, p] = -1.0                        # -seg0
        w_fg[p * hout + 1, p] = 1.0                         # +seg1

    return TailParams(
        w_packed,
        jnp.tile(scale, 4),
        jnp.tile(bias, 4),
        w_head_bd,
        jnp.tile(jnp.asarray(b_head, jnp.float32), 4),
        jnp.asarray(w_fg, jnp.float32))


def _kernel(x_hbm, w_ref, sb_ref, wh_ref, bh_ref, wfg_ref,
            out_ref, fg_ref, xbuf, imbuf, sem,
            *, RT, WP, CL, cin, cout4, hout4, n_tiles, n_b, alpha):
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
        preferred_element_type=jnp.float32)                 # [RT, WP, 4c]
    acc = acc * sb_ref[0] + sb_ref[1]
    acc = jnp.where(acc >= 0, acc, jnp.float32(alpha) * acc)

    out = jax.lax.dot_general(
        acc.astype(jnp.bfloat16), wh_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [RT, WP, 4h]
    out = out + bh_ref[...]

    d = jax.lax.dot_general(
        out, wfg_ref[...],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [RT, WP, 8]
    # first 4 columns hold per-cell (seg1 - seg0); count the foreground
    fg_ref[0] = jnp.sum((d[..., 0:4] > 0).astype(jnp.float32), axis=-1)

    out_ref[0] = out.astype(out_ref.dtype)


def pvnet_tail_packed(x: jnp.ndarray, params: TailParams,
                      alpha: float = 0.1, row_tile: int = 8,
                      out_dtype=jnp.float32
                      ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused raw-conv + BN + lrelu + head on an s2d-packed grid.

    Args:
      x: [B, H, W, cin_pad] bf16 raw-stage input (decoder features ++ rgb
        ++ zero channels to cin_pad); H, W even; cin_pad % 64 == 0.
      params: folded parameters from fold_tail_params.

    Returns:
      packed: [B, H/2, W/2, 4*hout] head outputs; cell (a, c) of output
        pixel (2i+a, 2j+c) lives in channel block (a*2+c)*hout.
      fgcnt: [B, H/2, W/2] float32 in {0..4}: how many of the cell's 4
        pixels are foreground (seg class 1 logit above class 0).
    """
    B, H, W, cin = x.shape
    assert H % 2 == 0 and W % 2 == 0 and cin % 64 == 0, (H, W, cin)
    k16cin, cout4 = params.w_packed.shape
    assert k16cin == 16 * cin
    hout4 = params.w_head.shape[1]
    HP, WP = H // 2, W // 2
    CL = 2 * cin

    RT = row_tile
    while HP % RT:
        RT //= 2
    n_tiles = HP // RT

    xp = jnp.pad(x.reshape(B, HP, 2, WP, CL),
                 ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
    sb = jnp.stack([params.scale4, params.bias4]).astype(jnp.float32)

    kern = functools.partial(
        _kernel, RT=RT, WP=WP, CL=CL, cin=cin, cout4=cout4, hout4=hout4,
        n_tiles=n_tiles, n_b=B, alpha=alpha)
    packed, fg = pl.pallas_call(
        kern,
        grid=(B, n_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, RT, WP, hout4), lambda b, t: (b, t, 0, 0)),
            pl.BlockSpec((1, RT, WP), lambda b, t: (b, t, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, HP, WP, hout4), out_dtype),
            jax.ShapeDtypeStruct((B, HP, WP), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, RT + 2, 2, WP + 16, CL), jnp.bfloat16),
            pltpu.VMEM((RT, WP, 16 * cin), jnp.bfloat16),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(xp, params.w_packed.astype(jnp.bfloat16), sb,
      params.w_head.astype(jnp.bfloat16), params.b_head, params.w_fg)
    return packed, fg


def pvnet_tail_reference(x: jnp.ndarray, params: TailParams,
                         alpha: float = 0.1
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """XLA reference of the fused tail (same folded params, plain layout).

    Returns (out [B, H, W, hout], fgcnt [B, H/2, W/2]) — used by tests
    and the off-TPU fallback; out is the unpacked head output.
    """
    from pvnet_tpu.ops.fused_conv import conv3x3_bn_lrelu_ref
    k16cin, cout4 = params.w_packed.shape
    cout = cout4 // 4
    hout = params.w_head.shape[1] // 4
    cin = k16cin // 16
    # recover the plain conv kernel from the packed form: block k = p*4+q,
    # output parity (a, c): w[p-a, q-c] — take the (a, c) = (1, 1) blocks
    # of taps p, q in 1..3.
    wp = params.w_packed.astype(jnp.float32).reshape(4, 4, cin, 4, cout)
    w = wp[1:, 1:, :, 3, :]                                 # [3, 3, cin, c]
    scale = params.scale4[:cout]
    bias = params.bias4[:cout]
    y = conv3x3_bn_lrelu_ref(x, w, scale, bias, alpha)      # [B, H, W, c]
    wh = params.w_head.astype(jnp.float32)[:cout, :hout]
    out = y @ wh + params.b_head[:hout]
    fg4 = (out[..., 1] > out[..., 0]).astype(jnp.float32).reshape(
        out.shape[0], out.shape[1] // 2, 2, out.shape[2] // 2, 2)
    fg = jnp.sum(fg4, axis=(2, 4))
    return out, fg
