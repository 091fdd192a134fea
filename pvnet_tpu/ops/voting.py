"""Batched, fixed-shape RANSAC keypoint voting on TPU.

This is the TPU-native redesign of the reference's CUDA voting layer
(ref lib/ransac_voting_gpu_layer/ransac_voting_gpu.py and
src/ransac_voting_kernel.cu). The reference runs a *per-image python loop*
with dynamic shapes (torch.nonzero / masked_select) and a data-dependent
while-loop RANSAC confidence stop (ref ransac_voting_gpu.py:525-576). None of
that maps onto XLA, so the design here is:

- **Fixed foreground budget** ``tn``: a uniformly random foreground subset
  replaces the reference's dynamic-shape subsampling above its cap
  (ref ransac_voting_gpu.py:536-540). Two selection strategies: stratified
  phase-grid sampling via a single-pass Pallas kernel (TPU default; see
  sample_foreground and ops/select_kernel.py) or top-k over
  (2*mask + uniform noise). Padding/invalid pixels carry zero direction
  vectors, so the voting kernel's ``|n| < 1e-6`` guard
  (ref ransac_voting_kernel.cu:121) excludes them from every count.

- **One fused hypothesis pass** of ``hn`` hypotheses instead of
  round-by-round early stopping: the reference's stop only saves *time* when
  the winning inlier ratio is already high; generating the worst-case
  hypothesis count in one batched pass is both statistically stronger and
  faster on TPU than a sequential loop.

- **Inlier counting as a fused broadcast-compare-reduce**: the cosine test
  ``dot(h - c, n) / (|h - c||n|) > thresh`` (ref ransac_voting_kernel.cu:
  119-125) is rewritten multiplication-only as
  ``dot > 0  and  dot^2 > thresh^2 * |d|^2 |n|^2`` so the O(hn*vn*tn)
  reduction never needs a sqrt or divide and never materializes the
  [hn, vn, tn] inlier tensor the CUDA kernel writes. Two implementations:
  an XLA formulation (default — its fused elementwise+reduce runs at ~50%
  of the VPU roofline on v5e) and a Pallas TPU kernel with VMEM
  accumulation (kept as an option; brute-force parity-tested).

- **Weighted least-squares refinement** on the winner's inliers as batched
  closed-form 2x2 solves (ref ransac_voting_gpu.py:578-595), and the
  hypothesis spatial covariance estimate for uncertainty PnP
  (ref ransac_voting_gpu.py:333-406).

Everything is jit-compatible, batched over images and keypoints, and runs
under vmap/pjit.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pvnet_tpu.ops.geometry import solve_2x2

# Guard constants matching the CUDA kernels
# (ref ransac_voting_kernel.cu:42,121).
_DEGENERATE_EPS = 1e-6
_NORM_EPS_SQ = 1e-12


class ForegroundSample(NamedTuple):
    """Fixed-shape foreground pixel sample of a segmentation mask.

    Invariant: **valid slots form a contiguous prefix** — slot i is valid
    iff i < count. Pair sampling in :func:`generate_hypotheses` (and the
    vanishing-point variant) draws slot indices uniformly from [0, count)
    and relies on this. The top-k selection path provides it for free
    (scores sort valid-first); the stratified/packed samplers enforce it
    with :func:`_compact_valid_prefix`.
    """
    coords: jnp.ndarray   # [b, tn, 2] float32 (x, y) pixel coordinates
    dirs: jnp.ndarray     # [b, tn, vn, 2] predicted unit-vector field
    valid: jnp.ndarray    # [b, tn] bool; False entries never vote
    count: jnp.ndarray    # [b] int32 number of valid entries (kept pixels)
    total: jnp.ndarray    # [b] int32 foreground pixels before subsampling


def _compact_valid_prefix(coords: jnp.ndarray, dirs: jnp.ndarray,
                          valid: jnp.ndarray
                          ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Permute sample slots so valid entries form a contiguous prefix.

    Stratified phase-grid selection leaves each winner at its phase
    position, so any mask that doesn't cover every phase bucket (small /
    distant / heavily occluded objects) interleaves invalid slots through
    the range. Without compaction, uniform pair sampling over [0, count)
    draws degenerate zero-direction slots and can never reach valid slots
    at index >= count. A stable argsort over ~valid is cheap at tn ~ 1024
    (the gathers move ~tn rows once, vs. hn pair-gathers downstream).
    """
    order = jnp.argsort(~valid, axis=1, stable=True)        # valid-first
    coords = jnp.take_along_axis(coords, order[..., None], axis=1)
    dirs = jnp.take_along_axis(dirs, order[:, :, None, None], axis=1)
    valid = jnp.take_along_axis(valid, order, axis=1)
    return coords, dirs, valid


def _phase_grid(tn: int) -> Tuple[int, int]:
    """Factor the pixel budget tn = a * b with a <= b, a maximal <= sqrt(tn).

    (a, b) is the phase grid of the stratified sampler: pixels with equal
    (y mod a, x mod b) compete for one slot. For highly composite tn
    (powers of two, the normal case) this is ~square."""
    a = int(tn ** 0.5)
    while tn % a:
        a -= 1
    return a, tn // a


def _fast_uniform(key: jax.Array, shape) -> jnp.ndarray:
    """Uniform [0,1) noise; on TPU uses the hardware RNG (RBG) instead of
    threefry — counter-based threefry costs ~3.9 ms for a 16x480x640 batch
    on v5e, the hardware generator is ~free. Only used for selection
    tie-breaks, where generator quality is irrelevant; deterministic for a
    given key either way."""
    if jax.default_backend() == "tpu":
        kd = jnp.atleast_1d(jax.random.key_data(key)).astype(
            jnp.uint32).reshape(-1)
        kd = jnp.concatenate([kd, jnp.zeros(4, jnp.uint32)])[:4]
        _, bits = jax.lax.rng_bit_generator(
            kd, shape, dtype=jnp.uint32)
        return (bits >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
            2.0 ** -24)
    return jax.random.uniform(key, shape, dtype=jnp.float32)


def _sample_foreground_stratified(mask, vertex, tn, key) -> ForegroundSample:
    """Stratified phase-grid selection with a one-hot reduction gather.

    Partition pixels into tn buckets by spatial phase (y mod a, x mod b),
    a*b = tn; in each bucket keep the foreground pixel with the highest
    uniform-noise score (= a uniform pick among that bucket's foreground).
    Any mask whose support spans an a x b window touches every bucket, so
    objects larger than the budget fill it; smaller objects keep ~one pixel
    per phase they cover, evenly spread over the instance.

    Why not top-k + gather: on TPU, XLA lowers both top-k over h*w scores
    and the [b, h*w, vn, 2] row gather to serial loops — measured ~37 ms
    per 16-image batch at 480x640, as costly as the whole FCN forward.
    Here selection is a single-pass Pallas kernel (ops/select_kernel.py)
    that streams the field once at HBM bandwidth, with identical
    downstream semantics: a uniformly random foreground pixel per bucket,
    zero directions on invalid slots.

    ``vertex`` may be [b, h, w, vn, 2] (NHWC) or channel-major
    [b, vn*2, h, w] — the layout a PVNet built with head_layout='NCHW'
    emits, which avoids a ~12 ms/batch relayout of the conv output.
    """
    b, h, w = mask.shape
    cmajor = vertex.ndim == 4
    vn = (vertex.shape[1] // 2) if cmajor else vertex.shape[3]
    a, bb = _phase_grid(tn)
    on_tpu = jax.default_backend() == "tpu"
    # Pallas TPU blocks need the second-minor (the a phase rows) to be a
    # multiple of 8 — small budgets (tn=128 packed -> a=4) fall back to
    # the XLA select rather than crash in Mosaic
    pallas_ok = on_tpu and a % 8 == 0
    # the channel-major kernel competes on native 128-lane tiles
    cmajor_kernel = cmajor and pallas_ok and 128 % bb == 0
    pad_h = (-h) % a
    pad_w = (-w) % (128 if cmajor_kernel else bb)
    fg = (mask != 0)
    total = jnp.sum(fg.reshape(b, h * w), axis=1).astype(jnp.int32)

    noise = _fast_uniform(key, (b, h, w))
    score = fg.astype(jnp.float32) * 2.0 + noise
    if pad_h or pad_w:
        score = jnp.pad(score, ((0, 0), (0, pad_h), (0, pad_w)),
                        constant_values=-1.0)
        spatial_pad = ((0, 0), (0, pad_h), (0, pad_w))
        if cmajor:
            vertex = jnp.pad(vertex, ((0, 0), (0, 0),
                                      (0, pad_h), (0, pad_w)))
        else:
            vertex = jnp.pad(vertex, spatial_pad + ((0, 0), (0, 0)))
    hp, wp = h + pad_h, w + pad_w
    tx_n = wp // bb

    from pvnet_tpu.ops import select_kernel
    if cmajor:
        if cmajor_kernel:
            best, idx, dirs = select_kernel.stratified_select_cmajor(
                score, vertex, a, bb)
        else:
            best, idx, dirs = select_kernel.stratified_select_xla(
                score, vertex.transpose(0, 2, 3, 1), a, bb)
    else:
        vflat = vertex.reshape(b, hp, wp, vn * 2)
        if pallas_ok:
            best, idx, dirs = select_kernel.stratified_select(
                score, vflat, a, bb)
        else:
            best, idx, dirs = select_kernel.stratified_select_xla(
                score, vflat, a, bb)

    valid = (best >= 2.0).reshape(b, tn)                     # [b, tn]
    ty = (idx // tx_n).reshape(b, tn)
    tx = (idx % tx_n).reshape(b, tn)
    dirs = dirs.reshape(b, tn, vn, 2).astype(jnp.float32)
    dirs = dirs * valid[:, :, None, None].astype(dirs.dtype)

    phase_y = jax.lax.broadcasted_iota(jnp.int32, (a, bb), 0).reshape(tn)
    phase_x = jax.lax.broadcasted_iota(jnp.int32, (a, bb), 1).reshape(tn)
    ys = (ty * a + phase_y[None, :]).astype(jnp.float32)
    xs = (tx * bb + phase_x[None, :]).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)                    # [b, tn, 2]

    coords, dirs, valid = _compact_valid_prefix(coords, dirs, valid)
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return ForegroundSample(coords, dirs, valid, count, total)


def sample_foreground(mask: jnp.ndarray, vertex: jnp.ndarray, tn: int,
                      key: jax.Array, exact_topk: bool = False,
                      method: str = "auto") -> ForegroundSample:
    """Select up to ``tn`` random foreground pixels with fixed output shape.

    Replaces the reference's torch.nonzero + masked_select + random
    downsample (ref ransac_voting_gpu.py:536-546). Two strategies:

    - ``topk``: single top-k over (2*foreground + uniform noise) — a
      uniformly random subsample of the foreground, exactly the reference's
      subsampling above its cap. Uses ``lax.approx_max_k`` on TPU unless
      exact_topk=True. O(h*w log) selection plus a row gather; on TPU both
      lower to serial loops and dominate the whole pose pipeline.
    - ``stratified``: phase-grid bucketing + one-hot reduction (see
      :func:`_sample_foreground_stratified`) — streams the field once at
      HBM bandwidth; the kept set is a uniform pick per spatial phase
      rather than a global uniform subsample (RANSAC-equivalent coverage,
      better spatial spread; ~100x faster on TPU).

    ``method='auto'`` picks stratified on TPU, topk elsewhere.

    Args:
      mask:   [b, h, w] integer/bool segmentation (nonzero = foreground).
      vertex: [b, h, w, vn, 2] per-pixel keypoint direction field, or
        channel-major [b, vn*2, h, w] (the head_layout='NCHW' emission).
      tn:     fixed pixel budget.
      key:    PRNG key for the uniform subsample tiebreak.
    """
    if method == "auto":
        method = ("stratified" if jax.default_backend() == "tpu"
                  and not exact_topk else "topk")
    if method == "stratified":
        return _sample_foreground_stratified(mask, vertex, tn, key)
    assert method == "topk", method

    b, h, w = mask.shape
    if vertex.ndim == 4:                                    # channel-major
        c = vertex.shape[1]
        vertex = vertex.transpose(0, 2, 3, 1).reshape(b, h, w, c // 2, 2)
    vn = vertex.shape[3]
    fg = (mask != 0)
    flat_fg = fg.reshape(b, h * w)
    total = jnp.sum(flat_fg, axis=1).astype(jnp.int32)

    noise = jax.random.uniform(key, (b, h * w), dtype=jnp.float32)
    score = flat_fg.astype(jnp.float32) * 2.0 + noise
    if exact_topk or jax.default_backend() != "tpu":
        top_scores, top_idx = jax.lax.top_k(score, tn)      # [b, tn]
    else:
        top_scores, top_idx = jax.lax.approx_max_k(score, tn)
    valid = top_scores >= 2.0

    xs = (top_idx % w).astype(jnp.float32)
    ys = (top_idx // w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)                    # [b, tn, 2]

    vertex_flat = vertex.reshape(b, h * w, vn, 2)
    dirs = jnp.take_along_axis(vertex_flat, top_idx[:, :, None, None], axis=1)
    dirs = dirs * valid[:, :, None, None].astype(dirs.dtype)

    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return ForegroundSample(coords, dirs, valid, count, total)


def sample_foreground_packed(packed: jnp.ndarray, fgcnt: jnp.ndarray,
                             tn: int, key: jax.Array,
                             seg_dim: int = 2) -> ForegroundSample:
    """Stratified foreground sampling directly on an s2d-packed head field.

    Consumes the packed inference tail's outputs (ops/packed_tail.py):
    ``packed`` [b, HP, WP, 4*hout] holds the seg+ver head values of each
    2x2 full-resolution cell in depth, ``fgcnt`` [b, HP, WP] its
    foreground pixel count. Selection picks tn//4 cells on a phase grid
    over the packed (half-resolution) lattice — still an even spatial
    stratification of the instance — and expands each winner into its 4
    sub-pixels, whose validity comes from the per-pixel seg logits in the
    selected rows. The full-resolution fields never materialize.

    The 4 sub-pixels of a cell are adjacent, so a pixel *budget* tn has
    ~tn/4 spatially-distinct samples; callers wanting reference-equivalent
    diversity at budget N should pass tn = 4*N-ish (the pipeline uses the
    same max_num as the plain path — accuracy holds because hypothesis
    pairs from one cell are rejected by the degeneracy guard and inlier
    counting is unaffected by adjacency).

    Returns a ForegroundSample with tn slots (tn % 4 == 0 required);
    ``total`` is the exact full-resolution foreground pixel count.
    """
    b, HP, WP, h4 = packed.shape
    hout = h4 // 4
    # the sub-pixel foreground test below compares seg logits 1 vs 0
    # (ref train_linemod.py:99-102); other head layouts are unsupported
    assert seg_dim == 2, seg_dim
    vn = (hout - seg_dim) // 2
    assert tn % 4 == 0, tn
    blocks = tn // 4
    a, bb = _phase_grid(blocks)
    pad_h = (-HP) % a
    pad_w = (-WP) % bb
    total = jnp.sum(fgcnt.reshape(b, HP * WP), axis=1).astype(jnp.int32)

    noise = _fast_uniform(key, (b, HP, WP))
    score = (fgcnt > 0).astype(jnp.float32) * 2.0 + noise
    if pad_h or pad_w:
        score = jnp.pad(score, ((0, 0), (0, pad_h), (0, pad_w)),
                        constant_values=-1.0)
        packed = jnp.pad(packed, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    hp, wp = HP + pad_h, WP + pad_w
    tx_n = wp // bb

    from pvnet_tpu.ops import select_kernel
    # a % 8: Pallas TPU second-minor block constraint (small budgets like
    # tn=128 -> blocks=32 -> a=4 fall back to the XLA select)
    if jax.default_backend() == "tpu" and a % 8 == 0:
        best, idx, rows = select_kernel.stratified_select(score, packed,
                                                          a, bb)
    else:
        best, idx, rows = select_kernel.stratified_select_xla(score, packed,
                                                              a, bb)

    block_valid = (best >= 2.0).reshape(b, blocks)
    ty = (idx // tx_n).reshape(b, blocks)
    tx = (idx % tx_n).reshape(b, blocks)
    phase_y = jax.lax.broadcasted_iota(jnp.int32, (a, bb), 0).reshape(blocks)
    phase_x = jax.lax.broadcasted_iota(jnp.int32, (a, bb), 1).reshape(blocks)
    cell_y = ty * a + phase_y[None, :]                      # [b, blocks]
    cell_x = tx * bb + phase_x[None, :]

    rows = rows.reshape(b, blocks, 4, hout).astype(jnp.float32)
    sub_fg = rows[..., 1] > rows[..., 0]                    # [b, blocks, 4]
    sub_valid = sub_fg & block_valid[..., None]
    dirs = rows[..., seg_dim:].reshape(b, blocks, 4, vn, 2)
    dirs = dirs * sub_valid[..., None, None].astype(dirs.dtype)

    par = jnp.arange(4, dtype=jnp.int32)                    # (a2, c2) packed
    ys = 2 * cell_y[:, :, None] + (par // 2)[None, None, :]
    xs = 2 * cell_x[:, :, None] + (par % 2)[None, None, :]
    coords = jnp.stack([xs, ys], axis=-1).astype(jnp.float32)

    coords, dirs, valid = _compact_valid_prefix(
        coords.reshape(b, tn, 2), dirs.reshape(b, tn, vn, 2),
        sub_valid.reshape(b, tn))
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return ForegroundSample(coords, dirs, valid, count, total)


def generate_hypotheses(fg: ForegroundSample, hn: int, key: jax.Array,
                        shared_pairs: bool = True) -> jnp.ndarray:
    """Sample pixel pairs and intersect their voting rays in closed form.

    Mirrors generate_hypothesis_kernel (ref ransac_voting_kernel.cu:11-49):
    for a pair of pixels with directions d0, d1, normals n_i = (d_i.y,
    -d_i.x) define lines n_i . (p - c_i) = 0; the intersection solves the
    2x2 system. Degenerate (near-parallel) pairs produce the (0, 0)
    hypothesis, exactly like the CUDA kernel's early return over an
    at::zeros buffer (ref ransac_voting_kernel.cu:42-43, :75).

    With ``shared_pairs`` (default) one pixel pair is drawn per hypothesis
    and reused for every keypoint; the CUDA kernel draws independent pairs
    per (hypothesis, keypoint). Each keypoint's hypotheses are identically
    distributed either way (a uniform pair intersected under that
    keypoint's own direction field), and per-keypoint argmax selection
    never observes cross-keypoint correlation — but the shared form turns
    the gather into contiguous [vn*4]-rows, which measures ~5x faster on
    TPU (29 ms -> 5.8 ms at b=128, hn=tn=1024) than per-keypoint indexed
    gathers. shared_pairs=False restores the reference's exact sampling
    scheme.

    Returns:
      [b, hn, vn, 2] hypothesis points.
    """
    b, tn, vn, _ = fg.dirs.shape
    count = jnp.maximum(fg.count, 1)[:, None, None]

    # (dir, coords) packed so each sampled pixel is one fused gather
    feats = jnp.concatenate(
        [fg.dirs, jnp.broadcast_to(fg.coords[:, :, None, :],
                                   fg.dirs.shape)], axis=-1)  # [b,tn,vn,4]

    if shared_pairs:
        u = jax.random.uniform(key, (b, hn, 2), dtype=jnp.float32)
        idx = jnp.minimum((u * count).astype(jnp.int32), count - 1)
        flat = feats.reshape(b, tn, vn * 4)

        def gather_pair(i):                                 # i: [b, hn]
            f = jnp.take_along_axis(flat, i[:, :, None], axis=1)
            f = f.reshape(b, hn, vn, 4)
            return f[..., 2:4], f[..., 0:2]                 # coords, dir
        idx0, idx1 = idx[..., 0], idx[..., 1]
    else:
        u = jax.random.uniform(key, (b, hn, vn, 2), dtype=jnp.float32)
        idx = jnp.minimum((u * count[..., None]).astype(jnp.int32),
                          (count - 1)[..., None])           # [b, hn, vn, 2]

        def gather_pair(i):                                 # i: [b, hn, vn]
            f = jnp.take_along_axis(feats, i[..., None], axis=1)
            return f[..., 2:4], f[..., 0:2]                 # coords, dir
        idx0, idx1 = idx[..., 0], idx[..., 1]

    c0, d0 = gather_pair(idx0)
    c1, d1 = gather_pair(idx1)

    nx0, ny0 = d0[..., 1], -d0[..., 0]
    nx1, ny1 = d1[..., 1], -d1[..., 0]
    r0 = nx0 * c0[..., 0] + ny0 * c0[..., 1]
    r1 = nx1 * c1[..., 0] + ny1 * c1[..., 1]

    denom = nx1 * ny0 - nx0 * ny1
    ok = jnp.abs(denom) >= _DEGENERATE_EPS
    safe = jnp.where(ok, denom, 1.0)
    y = (nx1 * r0 - nx0 * r1) / safe
    x = -(ny1 * r0 - ny0 * r1) / safe
    hyp = jnp.stack([x, y], axis=-1)
    return jnp.where(ok[..., None], hyp, 0.0)


# ---------------------------------------------------------------------------
# Inlier counting — the O(hn * vn * tn) hot loop
# ---------------------------------------------------------------------------

def _pixel_features(fg: ForegroundSample) -> jnp.ndarray:
    """Per-(image, keypoint, pixel) features for the multiplication-only
    inlier test. Returns [b, vn, tn, 8]:
    (nx, ny, c.n, cx, cy, |c|^2, |n|^2, valid)."""
    b, tn, vn, _ = fg.dirs.shape
    nx = fg.dirs[..., 0]                                    # [b, tn, vn]
    ny = fg.dirs[..., 1]
    cx = fg.coords[..., 0:1]                                # [b, tn, 1]
    cy = fg.coords[..., 1:2]
    cn = cx * nx + cy * ny
    c2 = jnp.broadcast_to(cx * cx + cy * cy, nx.shape)
    n2 = nx * nx + ny * ny
    vmask = jnp.broadcast_to(fg.valid[..., None].astype(jnp.float32),
                             nx.shape)
    feats = jnp.stack([nx, ny, cn,
                       jnp.broadcast_to(cx, nx.shape),
                       jnp.broadcast_to(cy, nx.shape),
                       c2, n2, vmask], axis=-1)             # [b, tn, vn, 8]
    return jnp.transpose(feats, (0, 2, 1, 3))               # [b, vn, tn, 8]


def _hyp_features(hyps: jnp.ndarray) -> jnp.ndarray:
    """Per-(image, keypoint, hypothesis) features. hyps [b, hn, vn, 2] ->
    [b, vn, 4, hn]: (hx, hy, |h|^2, 1) with hn on the minor axis."""
    hx = hyps[..., 0]
    hy = hyps[..., 1]
    h2 = hx * hx + hy * hy
    ones = jnp.ones_like(hx)
    f = jnp.stack([hx, hy, h2, ones], axis=-1)              # [b, hn, vn, 4]
    return jnp.transpose(f, (0, 2, 3, 1))                   # [b, vn, 4, hn]


def _inlier_terms(pix, hyp, thresh):
    """Shared math: pix [..., 8] broadcast against hyp [..., 4] -> bool.

    pix axes supply (nx, ny, cn, cx, cy, c2, n2, valid); hyp axes supply
    (hx, hy, h2, 1). Caller arranges broadcasting shapes.
    """
    nx, ny, cn = pix[..., 0], pix[..., 1], pix[..., 2]
    cx, cy, c2 = pix[..., 3], pix[..., 4], pix[..., 5]
    n2, vmask = pix[..., 6], pix[..., 7]
    hx, hy, h2 = hyp[..., 0], hyp[..., 1], hyp[..., 2]

    dot = hx * nx + hy * ny - cn
    d2 = h2 - 2.0 * (hx * cx + hy * cy) + c2
    t2 = thresh * thresh
    return ((dot > 0)
            & (dot * dot > t2 * d2 * n2)
            & (d2 > _NORM_EPS_SQ)
            & (n2 > _NORM_EPS_SQ)
            & (vmask > 0.5))


def count_inliers_xla(fg: ForegroundSample, hyps: jnp.ndarray,
                      thresh: float, chunk: int = 256) -> jnp.ndarray:
    """Reference implementation in plain XLA, chunked over hypotheses.

    Semantics of voting_for_hypothesis_kernel
    (ref ransac_voting_kernel.cu:88-126). Returns counts [b, hn, vn] int32.
    """
    assert thresh > 0.0
    b, hn, vn, _ = hyps.shape
    pix = _pixel_features(fg)                               # [b, vn, tn, 8]

    chunk = min(chunk, hn)
    pad = (-hn) % chunk
    hyps_p = jnp.pad(hyps, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = (hn + pad) // chunk
    hyps_c = jnp.moveaxis(
        hyps_p.reshape(b, n_chunks, chunk, vn, 2), 1, 0)

    def body(_, hyp_chunk):                                 # [b, chunk, vn, 2]
        hx = hyp_chunk[..., 0]
        hy = hyp_chunk[..., 1]
        hf = jnp.stack([hx, hy, hx * hx + hy * hy, jnp.ones_like(hx)],
                       axis=-1)                             # [b, chunk, vn, 4]
        inl = _inlier_terms(pix[:, None],                   # [b,1,vn,tn,8]
                            hf[:, :, :, None, :],           # [b,c,vn,1,4]
                            thresh)                         # [b,c,vn,tn]
        return None, jnp.sum(inl, axis=-1).astype(jnp.int32)

    _, counts = jax.lax.scan(body, None, hyps_c)            # [nc, b, chunk, vn]
    counts = jnp.moveaxis(counts, 0, 1).reshape(b, n_chunks * chunk, vn)
    return counts[:, :hn]


def _count_kernel(pix_ref, hyp_ref, out_ref, *, thresh: float):
    """Pallas TPU kernel: one (group, hn-tile, tn-tile) grid cell.

    pix_ref: [1, TILE_T, 8]  pixel features (tn on sublanes)
    hyp_ref: [1, 4, TILE_H]  hypothesis features (hn on lanes)
    out_ref: [1, 1, TILE_H]  float32 counts, accumulated over tn tiles
    """
    tn_t = pl.program_id(2)

    @pl.when(tn_t == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    pix = pix_ref[0]                                        # [TILE_T, 8]
    nx = pix[:, 0:1]
    ny = pix[:, 1:2]
    cn = pix[:, 2:3]
    cx = pix[:, 3:4]
    cy = pix[:, 4:5]
    c2 = pix[:, 5:6]
    n2 = pix[:, 6:7]
    vmask = pix[:, 7:8]

    hx = hyp_ref[0, 0:1, :]                                 # [1, TILE_H]
    hy = hyp_ref[0, 1:2, :]
    h2 = hyp_ref[0, 2:3, :]

    dot = hx * nx + hy * ny - cn                            # [TILE_T, TILE_H]
    d2 = h2 - 2.0 * (hx * cx + hy * cy) + c2
    t2 = thresh * thresh
    inl = ((dot > 0)
           & (dot * dot > t2 * d2 * n2)
           & (d2 > _NORM_EPS_SQ)
           & (n2 > _NORM_EPS_SQ)
           & (vmask > 0.5))
    out_ref[0] += jnp.sum(inl.astype(jnp.float32), axis=0, keepdims=True)


def count_inliers_pallas(fg: ForegroundSample, hyps: jnp.ndarray,
                         thresh: float, tile_h: int = 512, tile_t: int = 256,
                         interpret: bool = False) -> jnp.ndarray:
    """Pallas inlier-count kernel. Returns counts [b, hn, vn] int32.

    Grid (b*vn, hn/tile_h, tn/tile_t); the [tile_t, tile_h] inlier tile
    lives only in VMEM and is reduced on the fly — the [hn, vn, tn] uint8
    tensor the CUDA path writes (ref ransac_voting_gpu.py:557) never exists.
    """
    assert thresh > 0.0
    b, hn, vn, _ = hyps.shape
    tn = fg.coords.shape[1]

    def round_up(x, m):
        return -(-x // m) * m

    # TPU lowering: block dims must be multiples of (8, 128) sublane/lane
    tile_h = min(tile_h, round_up(hn, 128))
    tile_t = min(tile_t, round_up(tn, 8))
    pad_h = round_up(hn, tile_h) - hn
    pad_t = round_up(tn, tile_t) - tn

    pix = _pixel_features(fg)                               # [b, vn, tn, 8]
    hyp = _hyp_features(hyps)                               # [b, vn, 4, hn]
    if pad_t:
        pix = jnp.pad(pix, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    if pad_h:
        hyp = jnp.pad(hyp, ((0, 0), (0, 0), (0, 0), (0, pad_h)))
    g = b * vn
    tn_p, hn_p = tn + pad_t, hn + pad_h
    pix = pix.reshape(g, tn_p, 8)
    hyp = hyp.reshape(g, 4, hn_p)

    grid = (g, hn_p // tile_h, tn_p // tile_t)
    counts = pl.pallas_call(
        functools.partial(_count_kernel, thresh=float(thresh)),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile_t, 8), lambda gi, hi, ti: (gi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, tile_h), lambda gi, hi, ti: (gi, 0, hi),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, tile_h), lambda gi, hi, ti: (gi, 0, hi),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, hn_p), jnp.float32),
        interpret=interpret,
    )(pix, hyp)

    counts = counts.reshape(b, vn, hn_p)[:, :, :hn]
    return jnp.transpose(counts, (0, 2, 1)).astype(jnp.int32)


def count_inliers_xla_bf16(fg: ForegroundSample, hyps: jnp.ndarray,
                           thresh: float, chunk: int = 256) -> jnp.ndarray:
    """bf16 inlier count: same semantics as :func:`count_inliers_xla` with
    the O(hn*vn*tn) compare-reduce in bfloat16 — f32 features use half the
    VPU lanes, and the count is the voting stage's dominant cost.

    Numerics (why this is NOT a cast of the mult-only form): the mult-only
    features cn/c2/h2 are O(coord^2) ~ 4e5, whose bf16 ULP (~2048) destroys
    the d2 cancellation. Instead (1) coordinates are recentered per image
    on the foreground centroid in f32 — sub-pixel ULPs survive the cast —
    and (2) the test runs in the difference form dot = (h-c).n,
    d2 = |h-c|^2, whose bf16 error is ~0.4% *relative* to the ray length.
    Per-pixel misclassification only dithers counts near the cosine
    boundary; the winner seeds an f32 WLS refine (inliers_for_points), so
    end metrics match f32 counting (tests/test_voting.py, envelope rows).
    """
    assert thresh > 0.0
    b, hn, vn, _ = hyps.shape

    valid_f = fg.valid.astype(jnp.float32)                  # [b, tn]
    denom = jnp.maximum(jnp.sum(valid_f, axis=1, keepdims=True), 1.0)
    ctr = (jnp.sum(fg.coords * valid_f[..., None], axis=1, keepdims=True)
           / denom[..., None])                              # [b, 1, 2]
    coords = (fg.coords - ctr).astype(jnp.bfloat16)         # [b, tn, 2]
    hyps_ctr = (hyps - ctr[:, :, None, :]).astype(jnp.bfloat16)

    dirs = fg.dirs.astype(jnp.bfloat16)                     # [b, tn, vn, 2]
    nx = jnp.transpose(dirs[..., 0], (0, 2, 1))[:, None]    # [b, 1, vn, tn]
    ny = jnp.transpose(dirs[..., 1], (0, 2, 1))[:, None]
    n2 = nx * nx + ny * ny
    cx = coords[..., 0][:, None, None, :]                   # [b, 1, 1, tn]
    cy = coords[..., 1][:, None, None, :]
    vmask = fg.valid[:, None, None, :]                      # [b, 1, 1, tn]
    t2 = jnp.bfloat16(thresh * thresh)
    eps2 = jnp.bfloat16(_NORM_EPS_SQ)

    chunk = min(chunk, hn)
    pad = (-hn) % chunk
    hyps_p = jnp.pad(hyps_ctr, ((0, 0), (0, pad), (0, 0), (0, 0)))
    n_chunks = (hn + pad) // chunk
    hyps_c = jnp.moveaxis(hyps_p.reshape(b, n_chunks, chunk, vn, 2), 1, 0)

    def body(_, hyp_chunk):                                 # [b, c, vn, 2]
        hx = hyp_chunk[..., 0][..., None]                   # [b, c, vn, 1]
        hy = hyp_chunk[..., 1][..., None]
        dx = hx - cx                                        # [b, c, vn, tn]
        dy = hy - cy
        dot = dx * nx + dy * ny
        d2 = dx * dx + dy * dy
        inl = ((dot > 0)
               & (dot * dot > t2 * d2 * n2)
               & (d2 > eps2)
               & (n2 > eps2)
               & vmask)
        return None, jnp.sum(inl, axis=-1).astype(jnp.int32)

    _, counts = jax.lax.scan(body, None, hyps_c)            # [nc, b, c, vn]
    counts = jnp.moveaxis(counts, 0, 1).reshape(b, n_chunks * chunk, vn)
    return counts[:, :hn]


def count_inliers(fg: ForegroundSample, hyps: jnp.ndarray, thresh: float,
                  impl: Optional[str] = None) -> jnp.ndarray:
    """Dispatch between the XLA and Pallas implementations.

    Default is 'xla': the fused broadcast-compare-reduce XLA emits runs at
    ~50% of the VPU elementwise roofline and beats the hand-written Pallas
    kernel at every measured shape on v5e (b1..b128, tn/hn 512..4096;
    e.g. 8.9 ms vs 12.8 ms at b=128, hn=tn=1024). The Pallas kernel is kept
    as an option ('pallas', 'pallas_interpret') and stays brute-force
    parity-tested. 'bf16' runs the count compare-reduce in bfloat16
    (count_inliers_xla_bf16) — winner selection only; the WLS refine stays
    f32 either way."""
    if impl is None:
        impl = "xla"
    if impl == "pallas":
        return count_inliers_pallas(fg, hyps, thresh)
    if impl == "pallas_interpret":
        return count_inliers_pallas(fg, hyps, thresh, interpret=True)
    if impl == "bf16":
        return count_inliers_xla_bf16(fg, hyps, thresh)
    return count_inliers_xla(fg, hyps, thresh)


def inliers_for_points(fg: ForegroundSample, pts: jnp.ndarray, thresh: float
                       ) -> jnp.ndarray:
    """Inlier mask of every pixel w.r.t. one point per keypoint.

    The reference re-runs the voting kernel with hn=1 on the winner
    (ref ransac_voting_gpu.py:582-584). pts: [b, vn, 2] -> bool [b, vn, tn].
    """
    pix = _pixel_features(fg)                               # [b, vn, tn, 8]
    hx = pts[..., 0]
    hy = pts[..., 1]
    hf = jnp.stack([hx, hy, hx * hx + hy * hy, jnp.ones_like(hx)],
                   axis=-1)                                 # [b, vn, 4]
    return _inlier_terms(pix, hf[:, :, None, :], thresh)    # [b, vn, tn]


# ---------------------------------------------------------------------------
# Full voting layers
# ---------------------------------------------------------------------------

def _wls_refine(fg: ForegroundSample, win_pts: jnp.ndarray, thresh: float
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Weighted least-squares ray intersection over the winner's inliers.

    With inlier normals N (rows n_t = (d_t.y, -d_t.x)) and pixels c_t, solve
    argmin_p sum_t (n_t . p - n_t . c_t)^2 via the normal equations
    (N^T N) p = N^T b (ref ransac_voting_gpu.py:578-595). Singular systems
    (< 2 independent inlier rays) keep the RANSAC winner instead of the
    reference's unguarded solve.

    Returns (refined [b, vn, 2], inlier mask [b, vn, tn]).
    """
    inl = inliers_for_points(fg, win_pts, thresh)           # [b, vn, tn]
    w = inl.astype(jnp.float32)

    normal = jnp.stack([fg.dirs[..., 1], -fg.dirs[..., 0]], axis=-1)
    normal = jnp.transpose(normal, (0, 2, 1, 3))            # [b, vn, tn, 2]
    nm = normal * w[..., None]

    bscal = jnp.sum(nm * fg.coords[:, None, :, :], axis=-1)  # [b, vn, tn]
    ata = jnp.einsum("bvti,bvtj->bvij", nm, nm)
    atb = jnp.sum(nm * bscal[..., None], axis=2)             # [b, vn, 2]

    det = ata[..., 0, 0] * ata[..., 1, 1] - ata[..., 0, 1] * ata[..., 1, 0]
    sol = solve_2x2(ata, atb)
    refined = jnp.where((jnp.abs(det) > 1e-8)[..., None], sol, win_pts)
    return refined, inl


def ransac_voting_v3(mask: jnp.ndarray, vertex: jnp.ndarray, key: jax.Array,
                     hyp_num: int = 1024, inlier_thresh: float = 0.99,
                     max_num: int = 1024, min_num: int = 5,
                     impl: Optional[str] = None,
                     select_method: str = "auto") -> jnp.ndarray:
    """Production inference voting (ref ransac_voting_gpu.py:514-598).

    Args:
      mask:   [b, h, w] predicted segmentation (nonzero = object).
      vertex: [b, h, w, vn, 2] predicted direction field.
      key:    PRNG key.
      hyp_num: total hypotheses (the reference generates round_hyp_num=128
        per round for up to 21 rounds; one fused pass replaces the loop).
      inlier_thresh: cosine threshold (production eval uses 0.99,
        ref train_linemod.py:104-106).
      max_num: fixed foreground budget (reference eval path uses 100).
      min_num: below this foreground count the output is zeros.

    Returns:
      [b, vn, 2] voted keypoint locations.
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    return ransac_voting_v3_from_fg(fg, k2, hyp_num=hyp_num,
                                    inlier_thresh=inlier_thresh,
                                    min_num=min_num, impl=impl)


def ransac_voting_v3_from_fg(fg: ForegroundSample, key: jax.Array,
                             hyp_num: int = 1024,
                             inlier_thresh: float = 0.99, min_num: int = 5,
                             impl: Optional[str] = None) -> jnp.ndarray:
    """v3 voting from a pre-built foreground sample — the core shared by
    the mask/vertex front-end and the fused-tail inference path
    (voting.sample_foreground_packed)."""
    hyps = generate_hypotheses(fg, hyp_num, key)
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)  # [b, hn, vn]
    return vote_argmax_refine(fg, hyps, counts, inlier_thresh, min_num)


def vote_argmax_refine(fg: ForegroundSample, hyps: jnp.ndarray,
                       counts: jnp.ndarray, inlier_thresh: float,
                       min_num: int = 5) -> jnp.ndarray:
    """Final v3 stage: winner argmax over counts [b, hn, vn], gather the
    winning hypotheses, WLS-refine over their inliers, zero below-budget
    images (ref ransac_voting_gpu.py:571-595). Split out so the fused-path
    stage bench can time it in isolation."""
    win_idx = jnp.argmax(counts, axis=1)                    # [b, vn]
    win_pts = jnp.take_along_axis(
        hyps, win_idx[:, None, :, None], axis=1)[:, 0]      # [b, vn, 2]

    refined, _ = _wls_refine(fg, win_pts, inlier_thresh)
    ok = (fg.total >= min_num)[:, None, None]
    return jnp.where(ok, refined, 0.0)


def ransac_voting_v2(mask: jnp.ndarray, vertex: jnp.ndarray, key: jax.Array,
                     hyp_num: int = 1024, inlier_thresh: float = 0.999,
                     max_num: int = 1024, min_num: int = 5,
                     refine_iter_num: int = 1,
                     impl: Optional[str] = None,
                     select_method: str = "auto") -> jnp.ndarray:
    """v2 voting: RANSAC winner + ``refine_iter_num`` rounds of re-vote and
    least-squares refit (ref ransac_voting_gpu.py:99-215).

    Each refinement round re-runs the inlier vote on the *current* point and
    refits by least squares over the inlier normals — the reference solves
    ``pinverse(A) b`` per keypoint (ref :183-205), which equals the normal
    equations ``(N^T N)^{-1} N^T b`` whenever >= 2 independent rays support
    the point; singular systems keep the previous point (the reference's
    pinverse would return a minimum-norm garbage solution there; its
    empty-inlier guard at :194-196 returns zeros — we keep the RANSAC
    winner, strictly better).

    With ``refine_iter_num=1`` this is exactly v3 (one vote + one WLS fit),
    which is why the production path uses v3; the extra iterations matter
    only when the winner is far enough off that its inlier set shifts
    (see tests/test_voting.py::TestV2Refinement). The reference's default
    inlier threshold here is 0.999 (ref :99), tighter than v3's 0.99.

    Returns [b, vn, 2] voted keypoints (single foreground class; wrap with
    :func:`ransac_voting_multiclass` for the reference's [b,cn,vn,2] form).
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_hypotheses(fg, hyp_num, k2)
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)
    win_idx = jnp.argmax(counts, axis=1)
    pts = jnp.take_along_axis(
        hyps, win_idx[:, None, :, None], axis=1)[:, 0]      # [b, vn, 2]

    for _ in range(refine_iter_num):
        pts, _ = _wls_refine(fg, pts, inlier_thresh)

    ok = (fg.total >= min_num)[:, None, None]
    return jnp.where(ok, pts, 0.0)


def estimate_voting_distribution(
        mask: jnp.ndarray, vertex: jnp.ndarray, key: jax.Array,
        round_hyp_num: int = 256, min_hyp_num: int = 4096, topk: int = 128,
        inlier_thresh: float = 0.99, min_num: int = 5, max_num: int = 1024,
        impl: Optional[str] = None,
        select_method: str = "auto") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Hypothesis-distribution mean and covariance, no mean given.

    Mirrors ref ransac_voting_gpu.py:263-331: generate
    ``ceil(min_hyp_num / round_hyp_num) * round_hyp_num`` hypotheses (the
    reference's rounds of 256 exist only because its CUDA buffers are sized
    per round — one fused pass is equivalent), weight each by its inlier
    ratio but keep only the per-keypoint top-k(128) weights (ref :321-322),
    then form the weighted mean and the weighted 2x2 scatter about it.

    The top-k cut is implemented as a threshold at the k-th ratio, which
    keeps >= k hypotheses when ties straddle the boundary — RANSAC ratios
    are i.i.d. over hypotheses, so ties beyond double precision are
    measure-zero on real fields and the estimator is unchanged.

    Images with < min_num foreground pixels return zero mean and zero cov
    (the reference pads zero hypotheses with uniform weights, ref :273-278,
    which yields the same zeros).

    Returns (mean [b, vn, 2], cov [b, vn, 2, 2]).
    """
    hn = int(-(-min_hyp_num // round_hyp_num) * round_hyp_num)
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_hypotheses(fg, hn, k2)                  # [b, hn, vn, 2]
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)

    denom = jnp.maximum(fg.count, 1).astype(jnp.float32)[:, None, None]
    ratio = counts.astype(jnp.float32) / denom              # [b, hn, vn]
    rt = jnp.transpose(ratio, (0, 2, 1))                    # [b, vn, hn]
    kth = jax.lax.top_k(rt, topk)[0][..., -1:]              # [b, vn, 1]
    w = jnp.where(rt >= kth, rt, 0.0)
    w = jnp.transpose(w, (0, 2, 1))                         # [b, hn, vn]

    wsum = jnp.sum(w, axis=1) + 1e-12                       # [b, vn]
    mean = jnp.sum(hyps * w[..., None], axis=1) / wsum[..., None]

    diff = hyps - mean[:, None, :, :]                       # [b, hn, vn, 2]
    cov = jnp.einsum("bhvi,bhvj->bvij", diff, diff * w[..., None])
    cov = cov / wsum[..., None, None]

    ok = (fg.total >= min_num)[:, None]
    mean = jnp.where(ok[..., None], mean, 0.0)
    cov = jnp.where(ok[..., None, None], cov, 0.0)
    return mean, cov


def ransac_voting_v5(mask: jnp.ndarray, vertex: jnp.ndarray, key: jax.Array,
                     hyp_num: int = 1024, inlier_thresh: float = 0.99,
                     max_num: int = 1024, min_num: int = 5,
                     conf_thresh: float = 0.999,
                     impl: Optional[str] = None,
                     select_method: str = "auto"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v3 plus a per-keypoint inlier-ratio confidence
    (ref ransac_voting_gpu.py:763-858; confidence vote at :848-850 uses a
    0.999 threshold regardless of ``inlier_thresh``).

    Returns:
      ([b, vn, 2] keypoints, [b, vn] confidence in [0, 1]).
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_hypotheses(fg, hyp_num, k2)
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)

    win_idx = jnp.argmax(counts, axis=1)
    win_pts = jnp.take_along_axis(
        hyps, win_idx[:, None, :, None], axis=1)[:, 0]

    refined, _ = _wls_refine(fg, win_pts, inlier_thresh)

    conf_inl = inliers_for_points(fg, refined, conf_thresh)
    denom = jnp.maximum(fg.count, 1).astype(jnp.float32)[:, None]
    conf = jnp.sum(conf_inl, axis=-1).astype(jnp.float32) / denom

    ok = (fg.total >= min_num)[:, None]
    refined = jnp.where(ok[..., None], refined, 0.0)
    conf = jnp.where(ok, conf, 0.0)
    return refined, conf


def estimate_voting_distribution_with_mean(
        mask: jnp.ndarray, vertex: jnp.ndarray, mean: jnp.ndarray,
        key: jax.Array, hyp_num: int = 4096, inlier_thresh: float = 0.99,
        max_num: int = 1024, min_num: int = 5,
        impl: Optional[str] = None,
        select_method: str = "auto") -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Spatial covariance of the hypothesis distribution about a given mean.

    Mirrors ref ransac_voting_gpu.py:333-406: generate >= 4096 hypotheses,
    weight each by its inlier ratio, zero weights below (max_ratio - 0.1),
    and accumulate the weighted 2x2 scatter about ``mean``.

    Returns:
      (mean [b, vn, 2] passed through, cov [b, vn, 2, 2]).
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    return estimate_voting_distribution_from_fg(
        fg, mean, k2, hyp_num=hyp_num, inlier_thresh=inlier_thresh,
        impl=impl)


def estimate_voting_distribution_from_fg(
        fg: ForegroundSample, mean: jnp.ndarray, key: jax.Array,
        hyp_num: int = 4096, inlier_thresh: float = 0.99,
        impl: Optional[str] = None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Covariance estimation from a pre-built foreground sample (core of
    estimate_voting_distribution_with_mean)."""
    hyps = generate_hypotheses(fg, hyp_num, key)            # [b, hn, vn, 2]
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)

    denom = jnp.maximum(fg.count, 1).astype(jnp.float32)[:, None, None]
    ratio = counts.astype(jnp.float32) / denom              # [b, hn, vn]
    thresh = jnp.max(ratio, axis=1, keepdims=True) - 0.1
    w = jnp.where(ratio < thresh, 0.0, ratio)               # [b, hn, vn]

    diff = hyps - mean[:, None, :, :]                       # [b, hn, vn, 2]
    wdiff = diff * w[..., None]
    cov = jnp.einsum("bhvi,bhvj->bvij", diff, wdiff)
    cov = cov / (jnp.sum(w, axis=1)[..., None, None] + 1e-3)
    return mean, cov


def ransac_voting_v4(mask: jnp.ndarray, vertex: jnp.ndarray, key: jax.Array,
                     hyp_num: int = 1024, inlier_thresh: float = 0.99,
                     max_num: int = 1024, min_num: int = 5,
                     impl: Optional[str] = None,
                     select_method: str = "auto"
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """v3 plus the per-keypoint scalar residual variance of the WLS fit
    (ref ransac_voting_gpu.py:669-760: var = sum(residual^2) / n_inliers
    with residual = N p - b over the winner's inliers; empty-mask images
    return variance 1 like the reference's ones-fill at :691).

    Returns ([b, vn, 2] keypoints, [b, vn] residual variance).
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_hypotheses(fg, hyp_num, k2)
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)
    win_idx = jnp.argmax(counts, axis=1)
    win_pts = jnp.take_along_axis(
        hyps, win_idx[:, None, :, None], axis=1)[:, 0]
    refined, inl = _wls_refine(fg, win_pts, inlier_thresh)

    w = inl.astype(jnp.float32)                              # [b, vn, tn]
    normal = jnp.stack([fg.dirs[..., 1], -fg.dirs[..., 0]], axis=-1)
    normal = jnp.transpose(normal, (0, 2, 1, 3)) * w[..., None]
    bscal = jnp.sum(normal * fg.coords[:, None, :, :], axis=-1)
    residual = jnp.sum(normal * refined[:, :, None, :], axis=-1) - bscal
    var = jnp.sum(residual * residual, axis=-1) / jnp.maximum(
        jnp.sum(w, axis=-1), 1.0)

    ok = (fg.total >= min_num)[:, None]
    refined = jnp.where(ok[..., None], refined, 0.0)
    var = jnp.where(ok, var, 1.0)
    return refined, var


def ransac_voting_multiclass(mask: jnp.ndarray, vertex: jnp.ndarray,
                             key: jax.Array, class_num: int,
                             hyp_num: int = 1024,
                             inlier_thresh: Optional[float] = None,
                             max_num: int = 1024, min_num: int = 5,
                             refine_iter_num: Optional[int] = None,
                             impl: Optional[str] = None) -> jnp.ndarray:
    """Multi-class voting: per class c in 1..class_num-1, vote keypoints on
    the pixels labeled c (ref ransac_voting_layer / _v2,
    ransac_voting_gpu.py:10-215, whose python loops over (batch, class) are
    replaced by a static unroll over classes of the batched v3 layer).

    Args:
      mask: [b, h, w] integer labels (0 = background).
      refine_iter_num: None = one WLS refine (v3, matching the reference's
        plain ransac_voting_layer + its final fit); an integer selects the
        v2 form with that many re-vote + refit rounds (ref :99-215).
      inlier_thresh: None picks each form's reference default — 0.99 for
        the v3 form (ref :30) and 0.999 for v2 (ref :99).
    Returns:
      [b, class_num - 1, vn, 2].
    """
    if inlier_thresh is None:
        inlier_thresh = 0.99 if refine_iter_num is None else 0.999
    outs = []
    for c in range(1, class_num):
        key, sub = jax.random.split(key)
        cls_mask = (mask == c).astype(jnp.int32)
        if refine_iter_num is None:
            outs.append(ransac_voting_v3(
                cls_mask, vertex, sub, hyp_num=hyp_num,
                inlier_thresh=inlier_thresh, max_num=max_num,
                min_num=min_num, impl=impl))
        else:
            outs.append(ransac_voting_v2(
                cls_mask, vertex, sub, hyp_num=hyp_num,
                inlier_thresh=inlier_thresh, max_num=max_num,
                min_num=min_num, refine_iter_num=refine_iter_num,
                impl=impl))
    return jnp.stack(outs, axis=1)


def generate_hypotheses_with_counts(mask: jnp.ndarray, vertex: jnp.ndarray,
                                    key: jax.Array, hyp_num: int = 512,
                                    inlier_thresh: float = 0.99,
                                    max_num: int = 1024,
                                    impl: Optional[str] = None,
                                    select_method: str = "auto"
                                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Visualization helper: raw hypotheses and their inlier counts
    (ref generate_hypothesis, ransac_voting_gpu.py:983-1034, used by the
    demo's hypothesis scatter).

    Returns ([b, hn, vn, 2] hypotheses, [b, hn, vn] int32 counts).
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_hypotheses(fg, hyp_num, k2)
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)
    return hyps, counts


# ---------------------------------------------------------------------------
# Vanishing-point voting (homogeneous 3-vector hypotheses)
# ---------------------------------------------------------------------------

def generate_vanishing_hypotheses(fg: ForegroundSample, hn: int,
                                  key: jax.Array) -> jnp.ndarray:
    """Homogeneous vanishing-point hypotheses from pixel pairs.

    Mirrors generate_hypothesis_vanishing_point_kernel
    (ref ransac_voting_kernel.cu:170-229): lines l_i = (dy, -dx,
    cy*dx - cx*dy) in homogeneous form, intersection = cross(l0, l1), with
    the kernel's direction-consistency sign fix and zeroing of
    inconsistent (non-intersecting-ray) pairs.

    Returns [b, hn, vn, 3].
    """
    b, tn, vn, _ = fg.dirs.shape
    count = jnp.maximum(fg.count, 1)[:, None, None]
    u = jax.random.uniform(key, (b, hn, vn, 2), dtype=jnp.float32)
    idx = jnp.minimum((u * count[..., None]).astype(jnp.int32),
                      (count - 1)[..., None])
    idx0, idx1 = idx[..., 0], idx[..., 1]

    def gather_pair(i):
        c = jnp.take_along_axis(fg.coords, i.reshape(b, hn * vn)[..., None],
                                axis=1).reshape(b, hn, vn, 2)
        d = jnp.take_along_axis(fg.dirs, i[..., None], axis=1)
        return c, d

    c0, d0 = gather_pair(idx0)
    c1, d1 = gather_pair(idx1)
    dx0, dy0 = d0[..., 0], d0[..., 1]
    dx1, dy1 = d1[..., 0], d1[..., 1]
    cx0, cy0 = c0[..., 0], c0[..., 1]
    cx1, cy1 = c1[..., 0], c1[..., 1]

    lx0, ly0, lz0 = dy0, -dx0, cy0 * dx0 - cx0 * dy0
    lx1, ly1, lz1 = dy1, -dx1, cy1 * dx1 - cx1 * dy1

    x = ly0 * lz1 - lz0 * ly1
    y = lz0 * lx1 - lx0 * lz1
    z = lx0 * ly1 - ly0 * lx1

    val_x0 = dx0 * (x - z * cx0)
    val_x1 = dx1 * (x - z * cx1)
    val_y0 = dy0 * (y - z * cy0)
    val_y1 = dy1 * (y - z * cy1)

    flip = (val_x0 < 0) & (val_x1 < 0) & (val_y0 < 0) & (val_y1 < 0)
    sign = jnp.where(flip, -1.0, 1.0)
    bad = (val_x0 * val_x1 < 0) | (val_y0 * val_y1 < 0)
    hyp = jnp.stack([x, y, z], axis=-1) * sign[..., None]
    return jnp.where(bad[..., None], 0.0, hyp)


def vanishing_inliers_for_points(fg: ForegroundSample, pts: jnp.ndarray,
                                 thresh: float) -> jnp.ndarray:
    """Inlier mask of pixels w.r.t. homogeneous points [b, vn(, hn), 3].

    Mirrors voting_for_hypothesis_vanishing_point_kernel
    (ref ransac_voting_kernel.cu:268-310): diff = (hx - cx*hz, hy - cy*hz),
    both per-axis direction products must be >= 0 and |cos| > thresh.

    pts [b, hn, vn, 3] -> bool [b, hn, vn, tn]; pts [b, vn, 3] treated as
    hn = 1 and squeezed.
    """
    squeeze = pts.ndim == 3
    if squeeze:
        pts = pts[:, None]
    cx = fg.coords[:, None, None, :, 0]                  # [b,1,1,tn]
    cy = fg.coords[:, None, None, :, 1]
    dx = jnp.transpose(fg.dirs[..., 0], (0, 2, 1))[:, None]  # [b,1,vn,tn]
    dy = jnp.transpose(fg.dirs[..., 1], (0, 2, 1))[:, None]
    hx = pts[..., 0][..., None]                          # [b,hn,vn,1]
    hy = pts[..., 1][..., None]
    hz = pts[..., 2][..., None]

    diff_x = hx - cx * hz
    diff_y = hy - cy * hz
    n1sq = dx * dx + dy * dy
    n2sq = diff_x * diff_x + diff_y * diff_y
    dot = dx * diff_x + dy * diff_y
    t2 = thresh * thresh
    ok = ((dot * dot > t2 * n1sq * n2sq)
          & (diff_x * dx >= 0) & (diff_y * dy >= 0)
          & (n1sq > _NORM_EPS_SQ) & (n2sq > _NORM_EPS_SQ)
          & fg.valid[:, None, None, :])
    return ok[:, 0] if squeeze else ok


def ransac_voting_vanish_point(mask: jnp.ndarray, vertex: jnp.ndarray,
                               key: jax.Array, hyp_num: int = 1024,
                               inlier_thresh: float = 0.999,
                               max_num: int = 1024, min_num: int = 5,
                               select_method: str = "auto"
                               ) -> jnp.ndarray:
    """Vanishing-point RANSAC with SVD refinement
    (ref ransac_voting_gpu.py:408-501, minus that function's undefined
    class_num bug — this is the single-class batched form).

    Returns [b, vn, 3] unit homogeneous vanishing points.
    """
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_vanishing_hypotheses(fg, hyp_num, k2)

    inl = vanishing_inliers_for_points(fg, hyps, inlier_thresh)
    counts = jnp.sum(inl, axis=-1)                       # [b, hn, vn]
    hyps = hyps / jnp.maximum(
        jnp.linalg.norm(hyps, axis=-1, keepdims=True), 1e-12)
    win_idx = jnp.argmax(counts, axis=1)                 # [b, vn]
    win = jnp.take_along_axis(hyps, win_idx[:, None, :, None],
                              axis=1)[:, 0]              # [b, vn, 3]

    # refine: smallest right-singular vector of H = [-n | n.c] over inliers
    # (ref :469-491), via eigh of the 3x3 normal matrix
    winl = vanishing_inliers_for_points(fg, win, inlier_thresh)
    w = winl.astype(jnp.float32)                         # [b, vn, tn]
    nx = jnp.transpose(fg.dirs[..., 1], (0, 2, 1))       # normal=(dy,-dx)
    ny = -jnp.transpose(fg.dirs[..., 0], (0, 2, 1))
    nc = nx * fg.coords[:, None, :, 0] + ny * fg.coords[:, None, :, 1]
    H = jnp.stack([-nx, -ny, nc], axis=-1) * w[..., None]  # [b, vn, tn, 3]
    HtH = jnp.einsum("bvti,bvtj->bvij", H, H)
    from pvnet_tpu.ops.smalllinalg import eigh_small
    _, evec = jax.vmap(eigh_small)(HtH.reshape(-1, 3, 3))
    evec = evec.reshape(HtH.shape)
    refined = evec[..., 0]                               # [b, vn, 3]

    # direction correction: align with the consensus pixel directions
    # (the reference checks the first inlier's sign, ref :486-487; the
    # inlier-averaged test is equivalent for a consistent set)
    dxs = jnp.transpose(fg.dirs[..., 0], (0, 2, 1))
    score = jnp.sum(w * dxs * (refined[..., 0:1]
                               - refined[..., 2:3] * fg.coords[:, None, :, 0]),
                    axis=-1)
    refined = refined * jnp.where(score < 0, -1.0, 1.0)[..., None]

    enough = jnp.sum(w, axis=-1) >= 2
    out = jnp.where(enough[..., None], refined, win)
    ok = (fg.total >= min_num)[:, None, None]
    return jnp.where(ok, out, 0.0)


def ransac_voting_center(mask: jnp.ndarray, vertex: jnp.ndarray,
                         key: jax.Array, hyp_num: int = 512,
                         inlier_thresh: float = 0.99, max_num: int = 4096,
                         min_num: int = 100, impl: Optional[str] = None,
                         select_method: str = "auto"
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Instance-center voting (ref ransac_voting_gpu.py:600-667).

    The reference function is incomplete — it RANSAC-votes a single center
    (vn=1), computes the winner's inlier set, but never writes the instance
    mask on the success path and returns an empty list. This implements the
    evident intent as a fixed-shape batched op: vote the dominant instance
    center from a per-pixel center-direction field, then mark the pixels
    whose rays support it as that instance's mask.

    Args:
      mask:   [b, h, w] segmentation (nonzero = any instance).
      vertex: [b, h, w, 2] (or [b, h, w, 1, 2]) center-direction field.
      key:    PRNG key.
      min_num: reference skips images with < 100 foreground pixels
        (ref :617-622); such images return a zero mask / zero ratio.

    Returns:
      center:        [b, 2] voted instance center (pixel coords).
      instance_mask: [b, h, w] float32; 1 where the pixel voted for the
        winning center (restricted to the sampled foreground budget).
      win_ratio:     [b] winner's inlier ratio (confidence proxy).
    """
    b, h, w = mask.shape
    if vertex.ndim == 4:
        vertex = vertex[:, :, :, None, :]
    k1, k2 = jax.random.split(key)
    fg = sample_foreground(mask, vertex, max_num, k1, method=select_method)
    hyps = generate_hypotheses(fg, hyp_num, k2)             # [b, hn, 1, 2]
    counts = count_inliers(fg, hyps, inlier_thresh, impl=impl)

    win_idx = jnp.argmax(counts, axis=1)                    # [b, 1]
    win_counts = jnp.max(counts, axis=1).astype(jnp.float32)
    win_pts = jnp.take_along_axis(hyps, win_idx[:, None, :, None],
                                  axis=1)[:, 0]             # [b, 1, 2]
    win_ratio = win_counts[:, 0] / jnp.maximum(
        fg.count, 1).astype(jnp.float32)

    # final vote on the winner -> per-pixel support, scattered back to the
    # image grid (the "compute mean intersection again" step, ref :661-665)
    inl = inliers_for_points(fg, win_pts, inlier_thresh)[:, 0]  # [b, tn]
    flat_idx = (fg.coords[..., 1] * w + fg.coords[..., 0]).astype(jnp.int32)
    support = (inl & fg.valid).astype(jnp.float32)
    grid = jnp.zeros((b, h * w), jnp.float32)
    grid = jax.vmap(lambda g, i, s: g.at[i].max(s))(grid, flat_idx, support)
    instance_mask = grid.reshape(b, h, w)

    ok = fg.total >= min_num
    center = jnp.where(ok[:, None], win_pts[:, 0], 0.0)
    instance_mask = jnp.where(ok[:, None, None], instance_mask, 0.0)
    win_ratio = jnp.where(ok, win_ratio, 0.0)
    return center, instance_mask, win_ratio


def ransac_motion_voting(mask: jnp.ndarray, vertex: jnp.ndarray,
                         key: jax.Array, max_num: int = 4096,
                         select_method: str = "auto") -> jnp.ndarray:
    """Offset-field voting without RANSAC: mean of (pixel + offset) over the
    foreground (ref ransac_voting_gpu.py:960-981, used when the vertex field
    stores pixel offsets rather than unit directions).
    """
    fg = sample_foreground(mask, vertex, max_num, key, method=select_method)
    pts = fg.dirs + fg.coords[:, :, None, :]                # [b, tn, vn, 2]
    w = fg.valid[:, :, None, None].astype(jnp.float32)
    denom = jnp.maximum(fg.count, 1).astype(jnp.float32)[:, None, None]
    mean = jnp.sum(pts * w, axis=1) / denom
    return jnp.where((fg.total >= 1)[:, None, None], mean, 0.0)
