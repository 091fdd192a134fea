"""Pallas TPU kernel for stratified foreground selection.

Selects, for each spatial phase bucket (y mod a, x mod bb), the pixel with
the highest score, and returns that pixel's direction-field row — the hot
half of :func:`pvnet_tpu.ops.voting.sample_foreground` (stratified method).

Why a kernel: every XLA formulation of "argmax per phase + fetch the
winner's row" lowers badly on TPU — top-k + row gather becomes a serial
per-index loop (~37 ms per 16-image 480x640 batch, as costly as the whole
FCN forward), and one-hot masked-reduction rewrites still cost ~4 ms
because the phase-major transpose and multi-axis reduce defeat the tiler.

Layout is everything here. The field is streamed as a *flat* [b, h, w*C]
array so the VMEM block's minor dim is contiguous HBM data — with the
natural [.., w, C] blocking, C=18 lanes get padded to 128 and the DMA pays
~7x its useful bandwidth (measured 11.7 ms vs ~1 ms for the whole pass).
The running per-phase winner state is kept channel-expanded ([a, bb*C]),
and the [a, bb] compare mask is expanded across channels with a constant
0/1 matmul  mask @ E,  E[j, j*C+k] = 1  — an MXU-friendly repeat that
avoids the lane->sublane relayouts Mosaic would otherwise insert:

    for tx:  better = score[:, tx, :] > best           # [a, bb]
             best, idx <- where(better, ...)
             m = better @ E                             # [a, bb*C]
             dirs <- dirs + m * (field_tile - dirs)

Replaces the selection step of the reference's torch.nonzero /
masked_select subsampling (ref ransac_voting_gpu.py:536-546) — see
voting.sample_foreground for the semantics contract.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(score_ref, vert_ref, exp_ref, best_ref, idx_ref, dirs_ref,
            *, bb: int, c: int, tx_n: int):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        best_ref[...] = jnp.full_like(best_ref, -jnp.inf)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        dirs_ref[...] = jnp.zeros_like(dirs_ref)

    best = best_ref[0]                                      # [a, bb]
    bidx = idx_ref[0]
    bdirs = dirs_ref[0]                                     # [a, bb*C]
    E = exp_ref[...]                                        # [bb, bb*C]

    for tx in range(tx_n):
        sc = score_ref[0, :, tx, :]                         # [a, bb]
        better = sc > best
        best = jnp.where(better, sc, best)
        bidx = jnp.where(better, ti * tx_n + tx, bidx)
        m = jax.lax.dot(better.astype(jnp.float32), E,
                        preferred_element_type=jnp.float32)  # [a, bb*C]
        vslice = vert_ref[0, :, tx * bb * c:(tx + 1) * bb * c]
        # exact select (m is exactly 0.0/1.0): a bf16 arithmetic blend
        # would re-round and drift ~1 ulp from the true field values
        bdirs = jnp.where(m > 0, vslice, bdirs)

    best_ref[0] = best
    idx_ref[0] = bidx
    dirs_ref[0] = bdirs


def stratified_select(score: jnp.ndarray, vertex: jnp.ndarray,
                      a: int, bb: int
                      ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-phase winner over an [b, h, w] score map.

    Args:
      score:  [b, h, w] float32; larger wins. (Callers use
        2*foreground + uniform noise, so any foreground beats any
        background and ties break uniformly at random.)
      vertex: [b, h, w, C] field rows returned for each winner (any float
        dtype; bf16 halves the bandwidth of the dominant stream).
      a, bb:  phase grid; h % a == 0 == w % bb required (pad upstream).

    Returns:
      best:  [b, a, bb] float32 winning scores (-inf where a phase saw
        no pixels — impossible when h*w > 0).
      idx:   [b, a, bb] int32 flat tile index ty*(w//bb)+tx of the winner;
        the winner's pixel coords are (ty*a + phase_y, tx*bb + phase_x).
      dirs:  [b, a, bb, C] winner rows, in vertex's dtype.
    """
    b, h, w = score.shape
    c = vertex.shape[-1]
    assert vertex.shape[:3] == (b, h, w), (vertex.shape, score.shape)
    assert h % a == 0 and w % bb == 0, (h, w, a, bb)
    ty_n, tx_n = h // a, w // bb

    score_t = score.reshape(b, h, tx_n, bb)                 # free reshape
    vert_flat = vertex.reshape(b, h, w * c)                 # free reshape
    E = np.zeros((bb, bb * c), np.float32)
    for j in range(bb):
        E[j, j * c:(j + 1) * c] = 1.0
    E = jnp.asarray(E)

    kern = functools.partial(_kernel, bb=bb, c=c, tx_n=tx_n)
    best, idx, dirs = pl.pallas_call(
        kern,
        grid=(b, ty_n),
        in_specs=[
            pl.BlockSpec((1, a, tx_n, bb), lambda bi, ti: (bi, ti, 0, 0)),
            pl.BlockSpec((1, a, w * c), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((bb, bb * c), lambda bi, ti: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, a, bb), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, a, bb), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, a, bb * c), lambda bi, ti: (bi, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, bb), jnp.float32),
            jax.ShapeDtypeStruct((b, a, bb), jnp.int32),
            jax.ShapeDtypeStruct((b, a, bb * c), vertex.dtype),
        ],
    )(score_t, vert_flat, E)
    return best, idx, dirs.reshape(b, a, bb, c)


def _kernel_cmajor(score_ref, vert_ref, best_ref, idx_ref, dirs_ref,
                   *, lane_tiles: int):
    ti = pl.program_id(1)

    @pl.when(ti == 0)
    def _():
        best_ref[...] = jnp.full_like(best_ref, -jnp.inf)
        idx_ref[...] = jnp.zeros_like(idx_ref)
        dirs_ref[...] = jnp.zeros_like(dirs_ref)

    best = best_ref[0]                                      # [a, 128]
    bidx = idx_ref[0]
    bdirs = dirs_ref[0]                                     # [C, a, 128]

    # Every slice below is 128-lane aligned — no relayouts, no padding.
    for tx in range(lane_tiles):
        sc = score_ref[0, :, tx * 128:(tx + 1) * 128]       # [a, 128]
        better = sc > best
        best = jnp.where(better, sc, best)
        bidx = jnp.where(better, ti * lane_tiles + tx, bidx)
        vsl = vert_ref[0, :, :, tx * 128:(tx + 1) * 128]    # [C, a, 128]
        # leading-dim broadcast of the mask is free
        bdirs = jnp.where(better[None, :, :], vsl, bdirs)

    best_ref[0] = best
    idx_ref[0] = bidx
    dirs_ref[0] = bdirs


def stratified_select_cmajor(score: jnp.ndarray, vertex_cm: jnp.ndarray,
                             a: int, bb: int
                             ) -> Tuple[jnp.ndarray, jnp.ndarray,
                                        jnp.ndarray]:
    """:func:`stratified_select` for a channel-major [b, C, h, w] field.

    This is the preferred TPU form: a head emitting NCHW keeps the field's
    minor dims (h, w) compact in HBM (w = 640 is a multiple of the
    128-lane tile), so the kernel streams it with no channel padding and
    no producer relayout — the NHWC emission's padded-channel layout
    costs a ~12 ms relayout per 16-image batch just to re-read linearly.

    The kernel runs the competition on native [a, 128] lane tiles: one
    tile holds 128/bb independent replicas of the bb x-phases, so every
    slice is 128-aligned. The 128/bb per-phase sub-winners are merged by
    a tiny XLA epilogue. Requires bb to divide 128 (power-of-two pixel
    budgets) and w % 128 == 0 — callers pad or fall back.

    Returns (best [b, a, bb], idx [b, a, bb] — flat (y-band, x-tile)
    index ty*(w//bb)+tx of each winner — and dirs [b, a, bb, C]).
    """
    b, h, w = score.shape
    c = vertex_cm.shape[1]
    assert vertex_cm.shape == (b, c, h, w), (vertex_cm.shape, score.shape)
    assert h % a == 0 and w % 128 == 0, (h, w, a)
    assert 128 % bb == 0, bb
    g_n = 128 // bb                                         # replicas/tile
    ty_n, lane_tiles = h // a, w // 128

    kern = functools.partial(_kernel_cmajor, lane_tiles=lane_tiles)
    best4, idx4, dirs4 = pl.pallas_call(
        kern,
        grid=(b, ty_n),
        in_specs=[
            pl.BlockSpec((1, a, w), lambda bi, ti: (bi, ti, 0)),
            pl.BlockSpec((1, c, a, w), lambda bi, ti: (bi, 0, ti, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, a, 128), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, a, 128), lambda bi, ti: (bi, 0, 0)),
            pl.BlockSpec((1, c, a, 128), lambda bi, ti: (bi, 0, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, a, 128), jnp.float32),
            jax.ShapeDtypeStruct((b, a, 128), jnp.int32),
            jax.ShapeDtypeStruct((b, c, a, 128), vertex_cm.dtype),
        ],
    )(score, vertex_cm)

    # Epilogue over tiny tensors: merge the g_n sub-winners per phase.
    bg = best4.reshape(b, a, g_n, bb)
    g = jnp.argmax(bg, axis=2)                              # [b, a, bb]
    best = jnp.max(bg, axis=2)
    onehot = (jax.lax.broadcasted_iota(jnp.int32, (b, a, g_n, bb), 2)
              == g[:, :, None, :])
    i4 = idx4.reshape(b, a, g_n, bb)
    tile128 = jnp.sum(i4 * onehot, axis=2)                  # winner x128-tile
    ty = tile128 // lane_tiles
    tx128 = tile128 % lane_tiles
    # (16, 32)-grid tile index: x = tx128*128 + g*bb + phase_x
    idx = ty * (w // bb) + tx128 * g_n + g

    d4 = dirs4.reshape(b, c, a, g_n, bb)
    dirs = jnp.sum(d4 * onehot[:, None].astype(d4.dtype), axis=3)
    return best, idx, dirs.transpose(0, 2, 3, 1)            # [b, a, bb, C]


def stratified_select_xla(score: jnp.ndarray, vertex: jnp.ndarray,
                          a: int, bb: int
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Reference XLA implementation of :func:`stratified_select`
    (phase-major transpose + argmax + one-hot reduction). Used off-TPU and
    by parity tests."""
    b, h, w = score.shape
    c = vertex.shape[-1]
    ty_n, tx_n = h // a, w // bb

    s5 = score.reshape(b, ty_n, a, tx_n, bb)
    st = s5.transpose(0, 2, 4, 1, 3).reshape(b, a * bb, ty_n * tx_n)
    sel = jnp.argmax(st, axis=2).astype(jnp.int32)          # [b, a*bb]
    best = jnp.max(st, axis=2).reshape(b, a, bb)

    ty = (sel // tx_n).reshape(b, a, bb)
    tx = (sel % tx_n).reshape(b, a, bb)
    eq_y = (jax.lax.broadcasted_iota(jnp.int32, (b, ty_n, a, 1, bb), 1)
            == ty[:, None, :, None, :])
    eq_x = (jax.lax.broadcasted_iota(jnp.int32, (b, 1, a, tx_n, bb), 3)
            == tx[:, None, :, None, :])
    onehot = eq_y & eq_x                                    # [b,Ty,a,Tx,bb]
    v6 = vertex.reshape(b, ty_n, a, tx_n, bb, c)
    dirs = jnp.sum(v6 * onehot[..., None].astype(v6.dtype), axis=(1, 3))
    return best, (ty * tx_n + tx).reshape(b, a, bb), dirs.astype(vertex.dtype)
