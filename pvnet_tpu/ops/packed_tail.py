"""Packed full-resolution tail: upsample + raw conv + BN/LReLU + head,
computed entirely on a half-resolution, channel-packed lattice.

Why: the raw stage is the FCN forward's single most expensive piece
(~11 ms of a 37 ms batch-16 forward) because its tensors have tiny channel
counts — [b, 480, 640, 35] -> 32 runs at ~9 TF/s, the align-corners
upsample at ~1/3 of write bandwidth — all due to T(8,128) lane padding of
the minor dim (CLAUDE.md "Performance rules"). The same conv expressed on a
space-to-depth lattice with 4x the channels runs at ~105 TF/s (measured,
tools/bench_decoder.py). This module rewrites the tail exactly (same
floating-point operators, no approximation) on that lattice:

1. **Shifted phase upsample**: the 2x bilinear align-corners upsample
   (ref model_repository.py:30-58's nn.UpsamplingBilinear2d) is two
   interpolation matmuls; slicing their row sets by output parity yields
   the upsampled image directly in packed [b, H/2+1, W/2+1, 4c] form —
   full-resolution rows never materialize. The phase grid is *shifted by
   -1 pixel* so that step 2 becomes a VALID 2x2 conv (a same-grid packing
   would need a 3x3 packed kernel, 2.25x the FLOPs).
2. **Packed raw conv**: the full-res 3x3 conv (ref :53-58) is algebraically
   a 2x2 conv between the shifted input lattice and the output lattice,
   with weights scattered into [2, 2, 4*cin, 4*cout]. The rgb concat
   (ref :53 cats x2s-level features with the raw image) is handled as a
   *separate* 2x2 conv on the identically-packed image, summed — keeping
   both convs' channel dims at exact 128 multiples instead of padding
   140 -> 256.
3. **BN + LeakyReLU + 1x1 head** (ref :55-58, :76-79): phase-tiled affine
   and a block-diagonal head matmul on the packed activation.

Output: packed head fields [b, H/2, W/2, 4*(seg_dim+ver_dim)] plus the
per-cell foreground count — exactly what voting.sample_foreground_packed
consumes, so selection/voting/PnP run with no unpacking. Bit-for-bit
equivalence with the plain path is limited only by float reassociation
(tested to ~1e-5 in f32).

This replaces the Pallas s2d im2col tail (ops/tail_kernel.py), which lost
to plain XLA; here every op IS plain XLA on aligned shapes.
"""
from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.models.pvnet import _align_corners_matrix


class PackedTailParams(NamedTuple):
    """Folded inference parameters of the packed tail."""
    ah: jnp.ndarray        # [2, H/2+1, h2] shifted-phase h-interp matrices
    aw: jnp.ndarray        # [2, W/2+1, w2] shifted-phase w-interp matrices
    w_fm: jnp.ndarray      # [2, 2, 4*cin_fm, 4*cout] packed conv (features)
    w_im: jnp.ndarray      # [2, 2, 12, 4*cout] packed conv (rgb taps)
    scale4: jnp.ndarray    # [4*cout] phase-tiled BN scale
    bias4: jnp.ndarray     # [4*cout] phase-tiled BN bias
    w_head4: jnp.ndarray   # [4*cout, 4*hout] block-diagonal head
    b_head4: jnp.ndarray   # [4*hout]


def _shifted_phase_matrices(out_size: int, in_size: int) -> np.ndarray:
    """[2, out_size//2 + 1, in_size]: row r of matrix a is row (2r - 1 + a)
    of the align-corners interpolation matrix (zero rows out of range)."""
    A = _align_corners_matrix(out_size, in_size)            # [out, in]
    n = out_size // 2 + 1
    out = np.zeros((2, n, in_size), np.float32)
    for a in range(2):
        for r in range(n):
            src = 2 * r - 1 + a
            if 0 <= src < out_size:
                out[a, r] = A[src]
    return out


def _pack_scatter_tensor() -> np.ndarray:
    """Constant [3, 3, 2, 2, 4, 4] scatter: T[dy, dx, ky, kx, ab, pq] = 1
    iff full-res tap (dy, dx) of output phase pq = (p*2+q) lands on lattice
    offset (ky, kx) input phase ab = (a*2+b):  2ky + a = p + dy,
    2kx + b = q + dx."""
    T = np.zeros((3, 3, 2, 2, 4, 4), np.float32)
    for p in range(2):
        for q in range(2):
            for dy in range(3):
                for dx in range(3):
                    ky, a = divmod(p + dy, 2)
                    kx, b = divmod(q + dx, 2)
                    T[dy, dx, ky, kx, a * 2 + b, p * 2 + q] = 1.0
    return T


def _pack_conv_weights(w) -> jnp.ndarray:
    """[3, 3, cin, cout] full-res conv -> [2, 2, 4*cin, 4*cout] lattice conv.

    Output cell (I, J) phase (p, q) is full-res pixel (2I+p, 2J+q); its tap
    (dy, dx) reads full-res (2I+p+dy-1, 2J+q+dx-1), which lives on the
    shifted input lattice at cell (I+ky, J+kx) phase (a, b) with
    2ky + a = p + dy, 2kx + b = q + dx — ky, kx always in {0, 1}.
    Traceable (w may be a jit tracer): the scatter is a constant einsum."""
    w = jnp.asarray(w, jnp.float32)
    cin, cout = w.shape[2], w.shape[3]
    T = jnp.asarray(_pack_scatter_tensor())
    wp = jnp.einsum("yxio,yxkluv->kluivo", w, T)
    return wp.reshape(2, 2, 4 * cin, 4 * cout)


def _pack_image_kernel() -> np.ndarray:
    """[2, 2, 3, 12] identity strided-conv kernel: s2d of a padded image."""
    k = np.zeros((2, 2, 3, 12), np.float32)
    for a in range(2):
        for b in range(2):
            for c in range(3):
                k[a, b, c, (a * 2 + b) * 3 + c] = 1.0
    return k


def fold_packed_tail(w_raw, bn_scale, bn_bias, bn_mean, bn_var,
                     w_head, b_head, h: int, w: int, h2: int, w2: int,
                     eps: float = 1e-5, alpha: float = 0.1
                     ) -> PackedTailParams:
    """Fold trained raw-stage weights into packed-tail parameters.

    Args mirror the plain path's modules (ref model_repository.py:53-58,
    :76-79): w_raw [3, 3, cin, cout] with cin = s2dim + 3 (decoder features
    then rgb, the concat order of models/pvnet.py), BN stats [cout],
    w_head [1, 1, cout, hout] (+ bias), full-res (h, w), fm resolution
    (h2, w2) = 2s-stage shape.
    """
    del alpha  # activation applied in run_packed_tail
    w_raw = jnp.asarray(w_raw, jnp.float32)
    cout = w_raw.shape[3]
    cin_fm = w_raw.shape[2] - 3
    w_fm = _pack_conv_weights(w_raw[:, :, :cin_fm, :])
    # the rgb packed conv's input is the 12-channel packed image directly
    w_im = _pack_conv_weights(w_raw[:, :, cin_fm:, :])

    inv = jax.lax.rsqrt(jnp.asarray(bn_var, jnp.float32) + eps)
    scale = jnp.asarray(bn_scale, jnp.float32) * inv
    bias = (jnp.asarray(bn_bias, jnp.float32)
            - jnp.asarray(bn_mean, jnp.float32) * scale)

    wh = jnp.asarray(w_head, jnp.float32).reshape(cout, -1)
    hout = wh.shape[1]
    w_head4 = jnp.kron(jnp.eye(4, dtype=jnp.float32), wh)   # [4c, 4h]
    bh = jnp.zeros((hout,), jnp.float32) if b_head is None \
        else jnp.asarray(b_head, jnp.float32)

    return PackedTailParams(
        ah=jnp.asarray(_shifted_phase_matrices(h, h2)),
        aw=jnp.asarray(_shifted_phase_matrices(w, w2)),
        w_fm=w_fm,
        w_im=w_im,
        scale4=jnp.tile(scale, 4),
        bias4=jnp.tile(bias, 4),
        w_head4=w_head4,
        b_head4=jnp.tile(bh, 4),
    )


def phase_upsample_packed(fm: jnp.ndarray, ah: jnp.ndarray, aw: jnp.ndarray,
                          dtype=jnp.bfloat16) -> jnp.ndarray:
    """[b, h2, w2, c] -> shifted-lattice packed upsample
    [b, h2+1, w2+1, 4c] (phase order (a*2+b)c).

    Two einsums total: the row/column phase axes ride in the channel
    position of the intermediates ((a, c) then (a, B, c) minor), so the
    minor dims grow 32 -> 64 -> 128 instead of six separate c=32 kernels
    plus a concat of lane-padded operands."""
    b, h2, w2, c = fm.shape
    fm = fm.astype(dtype)
    ah = ah.astype(dtype)
    aw = aw.astype(dtype)
    hi = jnp.einsum("aoh,bhwc->bowac", ah, fm)          # [b, h2+1, w2, 2, c]
    up = jnp.einsum("Bpw,bowac->bopaBc", aw, hi)        # [b,h2+1,w2+1,2,2,c]
    return up.reshape(b, ah.shape[1], aw.shape[1], 4 * c)


def pack_image(image: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[b, h, w, 3] -> [b, h/2+1, w/2+1, 12] on the shifted lattice."""
    xp = jnp.pad(image.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    k = jnp.asarray(_pack_image_kernel(), dtype)
    return jax.lax.conv_general_dilated(
        xp, k, (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def run_packed_tail(fm: jnp.ndarray, image: jnp.ndarray,
                    tp: PackedTailParams, alpha: float = 0.1,
                    dtype=jnp.bfloat16, out_dtype=jnp.float32
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed tail forward.

    Args:
      fm:    [b, h2, w2, s2dim] 2s-stage decoder features (pre-upsample).
      image: [b, h, w, 3] normalized input (h = 2*h2, w = 2*w2).
    Returns:
      packed: [b, h2, w2, 4*hout] packed head fields, phase order (p*2+q).
      fgcnt:  [b, h2, w2] float32 foreground sub-pixel count per cell.
    """
    up = phase_upsample_packed(fm, tp.ah, tp.aw, dtype)     # [b,h2+1,w2+1,4c]
    xp = pack_image(image, dtype)                           # [b,h2+1,w2+1,12]

    # accumulate in f32 (MXU default for bf16 inputs) but emit the compute
    # dtype: the f32 [b, h2, w2, 4c] round trip costs a full extra pass
    acc_t = jnp.float32 if dtype == jnp.float32 else dtype
    y = jax.lax.conv_general_dilated(
        up, tp.w_fm.astype(dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_t)
    y = y + jax.lax.conv_general_dilated(
        xp, tp.w_im.astype(dtype), (1, 1), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_t)                       # [b,h2,w2,4c]

    y = y * tp.scale4.astype(acc_t) + tp.bias4.astype(acc_t)
    y = jnp.where(y > 0, y, jnp.asarray(alpha, acc_t) * y)
    packed = (y.astype(dtype) @ tp.w_head4.astype(dtype)
              ).astype(jnp.float32) + tp.b_head4            # [b,h2,w2,4h]

    hout = tp.b_head4.shape[0] // 4
    rows = packed.reshape(packed.shape[:3] + (4, hout))
    fgcnt = jnp.sum(rows[..., 1] > rows[..., 0], axis=-1).astype(jnp.float32)
    return packed.astype(out_dtype), fgcnt


def packed_tail_from_variables(variables, fm, image, alpha: float = 0.1,
                               dtype=jnp.bfloat16, out_dtype=None):
    """Convenience: fold PVNet raw-stage variables (Conv_4/BatchNorm_4/
    Conv_5, models/pvnet.py naming) and run the packed tail."""
    p = variables["params"]
    bn = variables["batch_stats"]["BatchNorm_4"]
    b, h, w, _ = image.shape
    tp = fold_packed_tail(
        p["Conv_4"]["kernel"], p["BatchNorm_4"]["scale"],
        p["BatchNorm_4"]["bias"], bn["mean"], bn["var"],
        p["Conv_5"]["kernel"], p["Conv_5"].get("bias"),
        h, w, fm.shape[1], fm.shape[2])
    if out_dtype is None:
        out_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    return run_packed_tail(fm, image, tp, alpha=alpha, dtype=dtype,
                           out_dtype=out_dtype)
