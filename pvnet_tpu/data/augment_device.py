"""On-device (jittable) training augmentation.

The reference runs its augmentation stack on the host inside 12 DataLoader
worker processes (ref lib/datasets/linemod_dataset.py:221-240,
lib/datasets/augmentation.py). On a host with few cores that pipeline is
the training bottleneck, so this module provides the same semantics as one
batched, fully jittable transform that runs inside the training step on
TPU:

- :func:`augment_batch` — per-image instance-centered rotation + overlap-
  constrained crop + resize as ONE composed affine warp (the same transform
  the host ``fused_rotate_crop_resize`` applies, itself equivalent to the
  reference's rotate_instance -> crop_or_padding_to_fixed_size_instance ->
  resize chain for use_old=true recipes, ref augmentation.py:55-64,
  118-158, 250-279), then horizontal flip (p=0.5, ref augmentation.py:
  66-73), separable Gaussian blur (p=0.5, kernel in {3,5,7,9}, ref
  linemod_dataset.py:229-233), fused color jitter (ref :185-190), and
  ImageNet normalization.

All randomness comes from a jax PRNG key; every image in the batch draws
independent parameters. Shapes are static: input [b, H, W, *], output
[b, out_h, out_w, *]. Hue is applied as an exact HSV-space rotation like
torchvision's, computed in float (the host path quantizes hue to uint8
OpenCV half-degrees; differences are below quantization noise).
"""
from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.config import AugConfig, IMAGENET_MEAN, IMAGENET_STD


# ---------------------------------------------------------------------------
# Instance statistics and warp sampling
# ---------------------------------------------------------------------------

def _instance_stats(mask: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
    """Foreground centroid + bbox of one [H, W] mask, with safe defaults
    (image center / full frame) when the mask is empty — the host path
    falls back to a plain random crop there (ref dataset._augmentation)."""
    h, w = mask.shape
    fg = (mask != 0)
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    cnt = jnp.sum(fg)
    safe = jnp.maximum(cnt, 1).astype(jnp.float32)
    cx = jnp.where(cnt > 0, jnp.sum(fg * xs) / safe, (w - 1) / 2.0)
    cy = jnp.where(cnt > 0, jnp.sum(fg * ys) / safe, (h - 1) / 2.0)
    big = jnp.float32(1e9)
    xmin = jnp.where(cnt > 0, jnp.min(jnp.where(fg, xs, big)), 0.0)
    xmax = jnp.where(cnt > 0, jnp.max(jnp.where(fg, xs, -big)), w - 1.0)
    ymin = jnp.where(cnt > 0, jnp.min(jnp.where(fg, ys, big)), 0.0)
    ymax = jnp.where(cnt > 0, jnp.max(jnp.where(fg, ys, -big)), h - 1.0)
    return cx, cy, xmin, xmax, ymin, ymax


def _sample_warp(mask: jnp.ndarray, key: jax.Array, out_h: int, out_w: int,
                 cfg: AugConfig) -> jnp.ndarray:
    """Sample the composed rotate+crop+resize forward affine M [2, 3]
    (src -> dst), mirroring the host fused_rotate_crop_resize math."""
    h, w = mask.shape
    k_rot, k_ratio, k_hbeg, k_wbeg = jax.random.split(key, 4)
    cx, cy, xmin, xmax, ymin, ymax = _instance_stats(mask)

    deg = jax.random.uniform(k_rot, (), minval=cfg.rot_ang_min,
                             maxval=cfg.rot_ang_max)
    ang = jnp.deg2rad(deg)
    a, b = jnp.cos(ang), jnp.sin(ang)
    # cv2.getRotationMatrix2D convention (y-down image frame)
    R = jnp.stack([
        jnp.stack([a, b, (1 - a) * cx - b * cy]),
        jnp.stack([-b, a, b * cx + (1 - a) * cy]),
    ])                                                     # [2, 3]

    corners = jnp.stack([
        jnp.stack([xmin, ymin, jnp.float32(1)]),
        jnp.stack([xmin, ymax, jnp.float32(1)]),
        jnp.stack([xmax, ymin, jnp.float32(1)]),
        jnp.stack([xmax, ymax, jnp.float32(1)]),
    ])                                                     # [4, 3]
    rc = corners @ R.T                                     # [4, 2]
    wmin_r, wmax_r = jnp.min(rc[:, 0]), jnp.max(rc[:, 0])
    hmin_r, hmax_r = jnp.min(rc[:, 1]), jnp.max(rc[:, 1])
    fh, fw = hmax_r - hmin_r, wmax_r - wmin_r

    ratio = jax.random.uniform(k_ratio, (), minval=cfg.resize_ratio_min,
                               maxval=cfg.resize_ratio_max)
    th = jnp.floor(out_h * ratio)
    tw = jnp.floor(out_w * ratio)

    def beg(kb, lo_edge, extent, tsize, full):
        pad = tsize >= full
        rmax = jnp.floor(jnp.minimum(lo_edge + cfg.overlap_ratio * extent,
                                     full - tsize))
        rmin = jnp.floor(jnp.maximum(lo_edge + cfg.overlap_ratio * extent
                                     - tsize, 0.0))
        hi = jnp.maximum(rmax, rmin + 1)
        u = jax.random.uniform(kb, ())
        rand = jnp.floor(rmin + u * (hi - rmin))
        return jnp.where(pad, -jnp.floor((tsize - full) / 2.0), rand)

    hbeg = beg(k_hbeg, hmin_r, fh, th, jnp.float32(h))
    wbeg = beg(k_wbeg, wmin_r, fw, tw, jnp.float32(w))

    s = 1.0 / ratio
    M = jnp.stack([
        (R[0] - jnp.array([0.0, 0.0, 1.0]) * wbeg) * s,
        (R[1] - jnp.array([0.0, 0.0, 1.0]) * hbeg) * s,
    ])
    return M


def _invert_affine(M: jnp.ndarray) -> jnp.ndarray:
    """Invert a [2, 3] affine (dst -> src sampling map)."""
    A = M[:, :2]
    t = M[:, 2]
    det = A[0, 0] * A[1, 1] - A[0, 1] * A[1, 0]
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    Ainv = jnp.stack([
        jnp.stack([A[1, 1], -A[0, 1]]),
        jnp.stack([-A[1, 0], A[0, 0]]),
    ]) / det
    tinv = -Ainv @ t
    return jnp.concatenate([Ainv, tinv[:, None]], axis=1)


def _warp_image(img: jnp.ndarray, mask: jnp.ndarray, M: jnp.ndarray,
                out_h: int, out_w: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bilinear (image) / nearest (mask) affine warp with zero border
    (cv2.warpAffine BORDER_CONSTANT semantics). img [H, W, 3] f32."""
    h, w = mask.shape
    Minv = _invert_affine(M)
    xo = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    yo = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = Minv[0, 0] * xo + Minv[0, 1] * yo + Minv[0, 2]    # [out_h, out_w]
    ys = Minv[1, 0] * xo + Minv[1, 1] * yo + Minv[1, 2]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0

    flat_img = img.reshape(h * w, -1)
    flat_msk = mask.reshape(h * w)

    def fetch(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        vals = jnp.take(flat_img, idx.reshape(-1), axis=0)
        vals = vals.reshape(out_h, out_w, -1)
        return vals * inside[..., None], inside

    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)
    v00, _ = fetch(x0i, y0i)
    v01, _ = fetch(x0i + 1, y0i)
    v10, _ = fetch(x0i, y0i + 1)
    v11, _ = fetch(x0i + 1, y0i + 1)
    out = ((1 - wy)[..., None] * ((1 - wx)[..., None] * v00
                                  + wx[..., None] * v01)
           + wy[..., None] * ((1 - wx)[..., None] * v10
                              + wx[..., None] * v11))

    xn = jnp.floor(xs + 0.5).astype(jnp.int32)
    yn = jnp.floor(ys + 0.5).astype(jnp.int32)
    inside_n = (xn >= 0) & (xn < w) & (yn >= 0) & (yn < h)
    idx_n = (jnp.clip(yn, 0, h - 1) * w
             + jnp.clip(xn, 0, w - 1)).astype(jnp.int32)
    out_mask = jnp.take(flat_msk, idx_n.reshape(-1), axis=0)
    out_mask = out_mask.reshape(out_h, out_w) * inside_n
    return out, out_mask


def _warp_image_u32(img: jnp.ndarray, mask: jnp.ndarray, M: jnp.ndarray,
                    out_h: int, out_w: int
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed-word affine warp: same semantics as :func:`_warp_image`
    (bilinear image / nearest mask, zero border) for uint8 inputs.

    Why a second implementation: the f32 warp gathers from a flat
    [h*w, 3] array whose minor dim 3 is lane-padded to 128 in HBM, so
    every random tap reads a ~512 B physical row for 12 useful bytes,
    and the image needs 4 taps + 1 more gather for the mask — measured
    ~220 ms of the 232 ms b16 480x640 device-aug step. Here rgb+mask
    pack into ONE dense [h*w] uint32 plane (r | g<<8 | b<<16 | m<<24):
    4 gathers total serve both outputs, the source array is compact, and
    all unpack/blend arithmetic runs on dense [out_h, out_w] planes.

    img [H, W, 3] uint8; mask [H, W] uint8/int32; M forward affine [2,3].
    Returns (image f32 [out_h, out_w, 3], mask int32 [out_h, out_w]).
    """
    h, w = mask.shape
    word = (img[..., 0].astype(jnp.uint32)
            | (img[..., 1].astype(jnp.uint32) << 8)
            | (img[..., 2].astype(jnp.uint32) << 16)
            | (mask.astype(jnp.uint32) << 24)).reshape(h * w)

    Minv = _invert_affine(M)
    xo = jnp.arange(out_w, dtype=jnp.float32)[None, :]
    yo = jnp.arange(out_h, dtype=jnp.float32)[:, None]
    xs = Minv[0, 0] * xo + Minv[0, 1] * yo + Minv[0, 2]
    ys = Minv[1, 0] * xo + Minv[1, 1] * yo + Minv[1, 2]

    x0 = jnp.floor(xs)
    y0 = jnp.floor(ys)
    wx = xs - x0
    wy = ys - y0
    x0i, y0i = x0.astype(jnp.int32), y0.astype(jnp.int32)

    def tap(xi, yi):
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        idx = (jnp.clip(yi, 0, h - 1) * w
               + jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
        words = jnp.take(word, idx.reshape(-1), axis=0)
        return words.reshape(out_h, out_w), inside

    w00, in00 = tap(x0i, y0i)
    w01, in01 = tap(x0i + 1, y0i)
    w10, in10 = tap(x0i, y0i + 1)
    w11, in11 = tap(x0i + 1, y0i + 1)

    def chan(shift):
        c00 = ((w00 >> shift) & 0xFF).astype(jnp.float32) * in00
        c01 = ((w01 >> shift) & 0xFF).astype(jnp.float32) * in01
        c10 = ((w10 >> shift) & 0xFF).astype(jnp.float32) * in10
        c11 = ((w11 >> shift) & 0xFF).astype(jnp.float32) * in11
        return ((1 - wy) * ((1 - wx) * c00 + wx * c01)
                + wy * ((1 - wx) * c10 + wx * c11))

    out = jnp.stack([chan(0), chan(8), chan(16)], axis=-1)

    # nearest tap = the bilinear corner selected by rounding each frac
    right = wx >= 0.5
    down = wy >= 0.5
    wn = jnp.where(down, jnp.where(right, w11, w10),
                   jnp.where(right, w01, w00))
    inn = jnp.where(down, jnp.where(right, in11, in10),
                    jnp.where(right, in01, in00))
    out_mask = ((wn >> 24) & 0xFF).astype(jnp.int32) * inn
    return out, out_mask


# ---------------------------------------------------------------------------
# Separable (two-pass) affine warp — the TPU-native formulation
# ---------------------------------------------------------------------------
#
# The gather warps above cost ~210-230 ms per 16-image 480x640 batch on this
# backend: XLA's per-element gather pays a per-index cost that dwarfs the
# byte traffic (packing rgb+mask into one u32 word only bought 10%). This
# formulation eliminates per-element gathers entirely.
#
# The affine warp factors into two 1-D resamples (Catmull-Smith 2-pass):
# with the dst->src map
#   xs = a x + b y + c ;  ys = d x + e y + f
# first resample each source COLUMN x1 along y at
#   ys'(x1, y) = (d/a) x1 + (e - d b/a) y + (f - d c/a)
# then resample each intermediate row along x at  xs = a x + (b y + c).
# The continuous composition passes through (xs, ys) exactly; discretely,
# the two vertical taps sit at ys' evaluated at floor(xs)/floor(xs)+1,
# i.e. on a line slanted by (d/a) per column — a sub-pixel vertical
# offset of at most |d/a|/2 <= tan(30deg)/2 ~ 0.29 px vs one-pass
# bilinear. That is the standard quality trade of 2-pass resampling; for
# augmentation it is at least as faithful as the reference's own chain,
# which resamples TWICE (rotate_instance -> resize, ref augmentation.py:
# 55-64, 250-279), where our gather warp resamples once. The affine
# GEOMETRY (keypoint/hcoord transforms) is identical; the nearest-mask
# differs from one-pass only in a <=1 px boundary band; rotation=0
# affines (crop/resize-only recipes) are bit-exact vs one-pass.
# Each 1-D resample has a SHARED scale (per image) and offsets
# linear in the other coordinate, which splits as
#   p = s*x + o_r = [s*x + frac(o_r)] + floor(o_r)
#   -> per-row CIRCULAR integer shift (ops/row_shift.py Pallas kernel:
#      log2(C) static rolls + bit selects, no per-element indexing; the
#      wrap is harmless because validity is computed from the true
#      unwrapped position and out-of-range outputs are zeroed)
#   -> three 0/1 SELECTION matmuls T_k[r, x] = Row[(base(x)+k) mod C]
#      with base(x) = floor(s*x) shared across rows (MXU work, exact:
#      one nonzero per output column)
#   -> an elementwise carry/blend with u = frac(s*x) + frac(o_r).
# Everything runs CHANNEL-MAJOR on [b, ch, rows, cols] planes whose minor
# dim is the full image width/height — the first (refuted) version of
# this pass ran NHWC with ch=4 minor (32x lane-padded in HBM) and a
# windowed take_along_axis shift (68.6 ms alone) and measured 287 ms;
# this plane+kernel form runs the WHOLE aug step (gather + stats + warp
# + flip + blur + jitter + norm) in 15.9 ms at b16 480x640 vs ~232 ms
# for the packed-u32 gather warp (tools/bench_train_pieces.py --pieces
# aug, real TPU). The mask rides as a 4th plane through the same matmuls
# and takes the nearest tap instead of the blend. Nearest-mask caveat: the vertical sample
# position is evaluated at the *rounded* horizontal tap rather than the
# fractional one, so mask pixels whose ys sits within |d/a|*0.5 px of a
# .5 boundary may round differently from the one-pass warp (a <=1 px
# band at instance edges; irrelevant for augmentation).
#
# Requires a = A_inv[0,0] > 0 — true for the training family (rotation
# <= +-30 deg, scale in [0.8, 1.2]); callers fall back to the gather warp
# for exotic affines.

def _sep_pass_cm(X: jnp.ndarray, scale: jnp.ndarray, offset: jnp.ndarray,
                 c_out: int) -> jnp.ndarray:
    """One 1-D resample of channel-major X [b, ch, R, C] along its minor
    C axis: out[b, ch, r, x] = lerp(X[b, ch, r, :] at position
    scale[b]*x + offset[b, r]), zero outside [0, C-1]. Channel 3 (if
    present) takes the nearest tap (mask semantics); others blend.

    Returns [b, ch, R, c_out] float32.
    """
    from pvnet_tpu.ops.row_shift import shift_lanes

    b, ch, R, C = X.shape

    i_r = jnp.floor(offset)                                 # [b, R]
    g_r = offset - i_r                                      # frac in [0,1)

    # per-row circular shift by floor(offset); broadcast over channels
    starts = jnp.broadcast_to(i_r.astype(jnp.int32)[:, None, :],
                              (b, ch, R)).reshape(b * ch, R)
    Xs = shift_lanes(X.reshape(b * ch, R, C), starts)       # [b*ch, R, C]

    x = jnp.arange(c_out, dtype=jnp.float32)
    sx = scale[:, None] * x[None, :]                        # [b, c_out]
    base = jnp.floor(sx)
    r_x = sx - base                                         # frac(s*x)
    base_i = base.astype(jnp.int32)

    t = jnp.arange(C, dtype=jnp.int32)
    # selection matrices W_k[b, t, x] = (t == (base(x)+k) mod C): exact
    # 0/1, one nonzero per output column; wrapped taps land on invalid
    # (zeroed) outputs only
    sel = jnp.stack([jnp.mod(base_i + k, C) for k in range(3)],
                    axis=1)                                 # [b, 3, c_out]
    Wsel = (t[None, :, None, None] == sel[:, None]).astype(jnp.float32)
    Wflat = Wsel.reshape(b, C, 3 * c_out)
    Xm = Xs.reshape(b, ch * R, C).astype(jnp.float32)
    # single-nonzero columns make this exact at any precision; HIGHEST
    # keeps the f32 values bit-clean through the MXU
    T = jax.lax.dot_general(Xm, Wflat, (((2,), (1,)), ((0,), (0,))),
                            precision=jax.lax.Precision.HIGHEST)
    T = T.reshape(b, ch, R, 3, c_out)                       # taps on axis 3

    # true sample position p = s*x + g_r + i_r; validity from p directly
    p = sx[:, None, :] + g_r[..., None] + i_r[..., None]    # [b, R, c_out]
    u_all = r_x[:, None, :] + g_r[..., None]                # [b, R, c_out]
    carry = u_all >= 1.0
    u = u_all - carry                                       # frac(p)
    lo = jnp.floor(p)
    v_lo = ((lo >= 0) & (lo <= C - 1))[:, None]             # [b, 1, R, c_out]
    v_hi = ((lo + 1 >= 0) & (lo + 1 <= C - 1))[:, None]
    carry_c = carry[:, None]
    u_c = u[:, None]

    A = jnp.where(carry_c, T[:, :, :, 1], T[:, :, :, 0]) * v_lo
    Bt = jnp.where(carry_c, T[:, :, :, 2], T[:, :, :, 1]) * v_hi
    out = (1.0 - u_c) * A + u_c * Bt                        # [b, ch, R, c_out]

    if ch == 4:                                             # nearest mask
        # nearest tap = raw tap value selected by round(frac); A/Bt are
        # already validity-zeroed, so out-of-range rounds to 0 (border)
        mask_out = jnp.where(u >= 0.5, Bt[:, 3], A[:, 3])
        out = jnp.concatenate([out[:, :3], mask_out[:, None]], axis=1)
    return out


def _warp_batch_sep(img: jnp.ndarray, mask: jnp.ndarray, Ms: jnp.ndarray,
                    out_h: int, out_w: int, s_max: float = 0.0,
                    out_layout: str = "NHWC"
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched two-pass affine warp (see the design note above).

    img [b, H, W, 3] (uint8 or float), mask [b, H, W], Ms [b, 2, 3]
    forward affines. s_max is accepted for API compatibility but unused
    (the circular-shift form needs no static window bound).
    Returns (img f32 [b, out_h, out_w, 3], mask int32 [b, out_h, out_w]);
    out_layout='NCHW' returns the image channel-major [b, 3, out_h, out_w]
    — the pipeline's native emission (no final transpose at all).
    """
    b, H, W = mask.shape
    A = jax.vmap(_invert_affine)(Ms)                        # [b, 2, 3]
    a, b_, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    d, e, f = A[:, 1, 0], A[:, 1, 1], A[:, 1, 2]
    p = d / a
    q = e - d * b_ / a
    r = f - d * c / a

    # channel-major planes with H minor for pass V: [b, 4, W, H]
    planes = jnp.concatenate(
        [jnp.transpose(img, (0, 3, 2, 1)).astype(jnp.float32),
         jnp.transpose(mask, (0, 2, 1)).astype(jnp.float32)[:, None]],
        axis=1)                                             # [b, 4, W, H]

    # pass V: resample along y at ys' = q*y + (p*x1 + r), per source column
    x1 = jnp.arange(W, dtype=jnp.float32)
    oV = p[:, None] * x1[None, :] + r[:, None]              # [b, W]
    I1 = _sep_pass_cm(planes, q, oV, out_h)                 # [b, 4, W, out_h]

    # pass H: resample along x at xs = a*x + (b_*y + c), per output row
    I1t = jnp.transpose(I1, (0, 1, 3, 2))                   # [b, 4, out_h, W]
    y = jnp.arange(out_h, dtype=jnp.float32)
    oH = b_[:, None] * y[None, :] + c[:, None]              # [b, out_h]
    O = _sep_pass_cm(I1t, a, oH, out_w)                     # [b,4,out_h,out_w]

    mask_out = jnp.rint(O[:, 3]).astype(jnp.int32)
    if out_layout == "NCHW":
        return O[:, :3], mask_out
    return jnp.transpose(O[:, :3], (0, 2, 3, 1)), mask_out

_BLUR_SIZES = (3, 5, 7, 9)
_MAX_K = 9


def _gauss_weights_bank() -> jnp.ndarray:
    """[4, 9] zero-padded 1D Gaussian kernels for sizes 3/5/7/9, matching
    cv2.GaussianBlur(sigma=0): OpenCV uses fixed small-kernel tables for
    ksize <= 7 and the sigma = 0.3*((k-1)*0.5 - 1) + 0.8 formula above."""
    import numpy as np
    fixed = {
        3: [0.25, 0.5, 0.25],
        5: [0.0625, 0.25, 0.375, 0.25, 0.0625],
        7: [0.03125, 0.109375, 0.21875, 0.28125, 0.21875, 0.109375,
            0.03125],
    }
    bank = np.zeros((len(_BLUR_SIZES), _MAX_K), np.float32)
    for i, k in enumerate(_BLUR_SIZES):
        if k in fixed:
            g = np.asarray(fixed[k], np.float64)
        else:
            sigma = 0.3 * ((k - 1) * 0.5 - 1) + 0.8
            half = k // 2
            x = np.arange(-half, half + 1, dtype=np.float64)
            g = np.exp(-(x * x) / (2 * sigma * sigma))
            g /= g.sum()
        off = (_MAX_K - k) // 2
        bank[i, off:off + k] = g
    return jnp.asarray(bank)


def _separable_blur(img: jnp.ndarray, wts: jnp.ndarray,
                    spatial_axes: Tuple[int, int] = (1, 2)) -> jnp.ndarray:
    """Apply a per-image separable kernel via shifted weighted sums.
    img [b, h, w, 3] (spatial_axes=(1, 2)) or channel-major [b, 3, h, w]
    (spatial_axes=(2, 3)); wts [b, 9]. Reflect-101 border like OpenCV."""
    half = _MAX_K // 2

    def pass_axis(x, axis):
        pad = [(0, 0)] * 4
        pad[axis] = (half, half)
        xp = jnp.pad(x, pad, mode="reflect")
        acc = jnp.zeros_like(x)
        for i in range(_MAX_K):
            sl = [slice(None)] * 4
            sl[axis] = slice(i, i + x.shape[axis])
            acc = acc + wts[:, i, None, None, None] * xp[tuple(sl)]
        return acc

    return pass_axis(pass_axis(img, spatial_axes[0]), spatial_axes[1])


def _rgb_to_hsv(rgb: jnp.ndarray, ch_axis: int = -1):
    if ch_axis == -1:
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    else:
        r, g, b = rgb[:, 0], rgb[:, 1], rgb[:, 2]
    mx = jnp.maximum(jnp.maximum(r, g), b)
    mn = jnp.minimum(jnp.minimum(r, g), b)
    d = mx - mn
    safe_d = jnp.where(d == 0, 1.0, d)
    # Branch on direct channel comparisons, NOT on ``mx == r``: under jit
    # XLA duplicates the producer chain of r/g/b into each fusion with
    # fma-contraction differences, so a recomputed ``mx`` can compare
    # unequal to ALL channels and fall through to a garbage sector (a
    # measured ~0.77 hue error on real pixels). ``r >= g & r >= b``
    # always selects a sector whose formula is valid for (near-)maximal
    # r; exact ties agree across sectors, so a 1-ULP flip is harmless.
    is_r = (r >= g) & (r >= b)
    is_g = (~is_r) & (g >= b)
    h = jnp.where(is_r, ((g - b) / safe_d) % 6.0,
                  jnp.where(is_g, (b - r) / safe_d + 2.0,
                            (r - g) / safe_d + 4.0)) / 6.0
    h = jnp.where(d == 0, 0.0, h)
    s = jnp.where(mx == 0, 0.0, d / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h: jnp.ndarray, s: jnp.ndarray, v: jnp.ndarray,
                ch_axis: int = -1):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5],
                   [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=(-1 if ch_axis == -1 else 1))


def _color_jitter(img: jnp.ndarray, key: jax.Array,
                  cfg: AugConfig, ch_axis: int = -1) -> jnp.ndarray:
    """Fused brightness/contrast/saturation FMA + HSV hue rotation
    (host equivalent: augment.color_jitter). img [b, h, w, 3] in 0..255
    (ch_axis=-1) or channel-major [b, 3, h, w] (ch_axis=1)."""
    b = img.shape[0]
    kb, kc, ks, kh = jax.random.split(key, 4)

    def factor(k, amount):
        if amount <= 0:
            return jnp.ones((b,), jnp.float32)
        return jax.random.uniform(k, (b,), minval=max(0.0, 1 - amount),
                                  maxval=1 + amount)

    fb = factor(kb, cfg.brightness)
    fc = factor(kc, cfg.contrast)
    fs = factor(ks, cfg.saturation)

    if ch_axis == -1:
        r, g, bl = img[..., 0], img[..., 1], img[..., 2]
    else:
        r, g, bl = img[:, 0], img[:, 1], img[:, 2]
    gray = 0.299 * r + 0.587 * g + 0.114 * bl               # [b, h, w]
    gmean = jnp.mean(gray, axis=(1, 2))
    a = (fb * fc * fs)[:, None, None, None]
    bco = (fb * fc * (1 - fs))[:, None, None, None]
    cco = (fb * (1 - fc) * gmean)[:, None, None, None]
    gray_b = gray[..., None] if ch_axis == -1 else gray[:, None]
    out = a * img + bco * gray_b + cco
    out = jnp.clip(out, 0.0, 255.0)

    if cfg.hue > 0:
        fh = jax.random.uniform(kh, (b,), minval=-cfg.hue, maxval=cfg.hue)
        h, s, v = _rgb_to_hsv(out / 255.0, ch_axis)
        h = (h + fh[:, None, None]) % 1.0
        out = _hsv_to_rgb(h, s, v, ch_axis) * 255.0
    return out


# ---------------------------------------------------------------------------
# Entry point
# ---------------------------------------------------------------------------

def augment_batch(image: jnp.ndarray, mask: jnp.ndarray,
                  hcoords: jnp.ndarray, key: jax.Array,
                  out_hw: Tuple[int, int], cfg: AugConfig,
                  normalize: bool = True, out_layout: str = "NHWC"
                  ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched jittable augmentation.

    Args:
      image:   [b, H, W, 3] float32 in 0..255 (raw pixels).
      mask:    [b, H, W] int32.
      hcoords: [b, k, 3] homogeneous keypoint targets.
      key:     PRNG key; independent draws per image.
      out_hw:  static output (height, width).
      cfg:     the recipe's aug_cfg (same schema as the host pipeline).
      normalize: apply ImageNet mean/std at the end (matching the host
        dataset's output contract).
      out_layout: 'NHWC' (default) emits the image [b, out_h, out_w, 3];
        'NCHW' emits it channel-major [b, 3, out_h, out_w] — the warp's
        native plane layout, so the whole photometric chain runs on
        dense-lane [.., h, w] planes and NO c=3-minor tensor (42x
        lane-padded in HBM) is ever materialized. Pair with a model built
        with input_layout='NCHW'. Same random draws either way.

    Returns:
      (image [b, out_h, out_w, 3] or [b, 3, out_h, out_w],
       mask [b, out_h, out_w] int32, hcoords [b, k, 3]).
    """
    b = image.shape[0]
    out_h, out_w = out_hw
    cm = out_layout == "NCHW"
    k_warp, k_flip, k_blur, k_jit, k_sel = jax.random.split(key, 5)

    u8_in = image.dtype == jnp.uint8
    if not u8_in:
        image = image.astype(jnp.float32)

    # --- geometric: one composed affine per image --------------------------
    if cfg.rotation or cfg.crop:
        warp_keys = jax.random.split(k_warp, b)
        Ms = jax.vmap(lambda m, k: _sample_warp(m, k, out_h, out_w, cfg))(
            mask, warp_keys)                                 # [b, 2, 3]
        rot_max = max(abs(cfg.rot_ang_min), abs(cfg.rot_ang_max))
        if rot_max < 75.0:
            # two-pass separable warp: shift + selection matmuls, no
            # per-element gathers (see the _sep_pass design note for the
            # sub-pixel quality trade vs the one-pass gather warps)
            s_max = (max(cfg.resize_ratio_max, 1.0 / cfg.resize_ratio_min)
                     / math.cos(math.radians(rot_max)))
            image, mask = _warp_batch_sep(image, mask, Ms, out_h, out_w,
                                          s_max, out_layout=out_layout)
        else:
            # gather fallback for exotic rotation ranges (a ~ cos(rot)
            # must stay away from 0 for the separable factorization)
            warp = _warp_image_u32 if u8_in else _warp_image
            image, mask = jax.vmap(
                lambda im, m, M: warp(im, m, M, out_h, out_w))(
                image, mask, Ms)
            if cm:
                image = jnp.transpose(image, (0, 3, 1, 2))
        last = jnp.broadcast_to(jnp.array([[0.0, 0.0, 1.0]]), (b, 1, 3))
        T = jnp.concatenate([Ms, last], axis=1)              # [b, 3, 3]
        hcoords = jnp.einsum("bkj,bij->bki", hcoords, T)
    else:
        image = image[:, :out_h, :out_w].astype(jnp.float32)
        mask = mask[:, :out_h, :out_w]
        if cm:
            image = jnp.transpose(image, (0, 3, 1, 2))

    # image axes from here on: NHWC [b, h, w, 3] or cm [b, 3, h, w]
    w_axis = 3 if cm else 2

    # --- horizontal flip, p=0.5 per image ----------------------------------
    if cfg.flip:
        do = jax.random.bernoulli(k_flip, 0.5, (b,))
        flipped = (image[:, :, :, ::-1] if cm else image[:, :, ::-1])
        image = jnp.where(do[:, None, None, None], flipped, image)
        mask = jnp.where(do[:, None, None], mask[:, :, ::-1], mask)
        hx = hcoords[..., 0]
        hx_f = out_w * hcoords[..., 2] - hx
        hcoords = hcoords.at[..., 0].set(
            jnp.where(do[:, None], hx_f, hx))

    # --- blur, p=0.5, kernel size uniform over {3,5,7,9} -------------------
    if cfg.blur:
        bank = _gauss_weights_bank()                         # [4, 9]
        sel = jax.random.randint(k_sel, (b,), 0, len(_BLUR_SIZES))
        wts = bank[sel]                                      # [b, 9]
        blurred = _separable_blur(image, wts,
                                  spatial_axes=(w_axis - 1, w_axis))
        do = jax.random.bernoulli(k_blur, 0.5, (b,))
        image = jnp.where(do[:, None, None, None], blurred, image)

    # --- color jitter -------------------------------------------------------
    if cfg.jitter:
        image = _color_jitter(image, k_jit, cfg, ch_axis=1 if cm else -1)

    if normalize:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        if cm:
            mean, std = mean[:, None, None], std[:, None, None]
        image = (image / 255.0 - mean) / std
    return image, mask.astype(jnp.int32), hcoords
