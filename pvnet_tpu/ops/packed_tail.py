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

This replaces an earlier Pallas s2d im2col tail (deleted), which measured
0.7-0.9x of plain XLA; here every op IS plain XLA on aligned shapes.
"""
from __future__ import annotations

import os
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
    w_im: jnp.ndarray      # [4, 4, 3, 4*cout] direct stride-2 conv (rgb)
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


#: Opt-in for the blocked banded upsample matmuls below. The banded
#: formulation cuts the contraction ~h2/O-fold but adds pads/concats and
#: narrower matmuls — exactly the trade this backend has refuted before
#: (CLAUDE.md: relayouts ~20-30 GB/s). Off until measured faster on TPU;
#: set PVNET_BLOCKED_UPSAMPLE=1 (import time) or flip here to enable.
BLOCKED_UPSAMPLE = os.environ.get("PVNET_BLOCKED_UPSAMPLE", "0") == "1"


def _concrete(a):
    """numpy view of a trace-time-constant array, or None for tracers."""
    try:
        return np.asarray(a)
    except Exception:
        return None


def _blocked_weights_dense(A: np.ndarray, O: int):
    """Blocked weights for an UNPACKED source axis: W [G, 2, O, O+1] with
    W[g, a, j, t] = A[a, g*O+j, g*O-1+t] (zero out of range), plus the
    tail-row weights wt [2] = A[:, h2, h2-1]. See _blocked_phase_weights
    for why blocking."""
    two, n, h2 = A.shape
    G = h2 // O
    W = np.zeros((G, 2, O, O + 1), np.float32)
    for g in range(G):
        for a in range(2):
            for j in range(O):
                for t in range(O + 1):
                    s = g * O - 1 + t
                    if 0 <= s < h2:
                        W[g, a, j, t] = A[a, g * O + j, s]
    return W, A[:, h2, h2 - 1].astype(np.float32)


def _pick_block(h2: int, cap: int = 16) -> int:
    """Largest even divisor of h2 that is <= cap (0 if none)."""
    for O in range(min(cap, h2) - min(cap, h2) % 2, 0, -2):
        if h2 % O == 0:
            return O
    return 0


def _blocked_phase_weights(A: np.ndarray, O: int):
    """Group the banded shifted-phase matrix A [2, n, h2] into per-block
    weights for a blocked banded matmul.

    Output lattice row K only taps source rows K-1 and K, so a dense
    einsum wastes an h2-wide contraction on 2 nonzeros (~17.5 ms for the
    raw-stage upsample at b128, running at 81 TF/s — FLOP-bound on waste).
    Splitting output rows into G groups of O rows bounds each group's
    source window to O+1 rows, cutting the contraction ~h2/O-fold while
    staying a matmul (layout-friendly; a pure two-tap shift+lerp was
    refuted — see phase_upsample_packed). Returns (W1, W0, wt):
      W1 [G, 2, O, O//2+1] — weights against ODD source rows
        g*O - 1 + 2u (packed phase 1, cells g*O//2 - 1 + u),
      W0 [G, 2, O, O//2]   — weights against EVEN source rows
        g*O + 2u (packed phase 0, cells g*O//2 + u),
      wt [2] — the single tail row K = h2 (taps source row h2-1)."""
    two, n, h2 = A.shape
    G = h2 // O
    W1 = np.zeros((G, 2, O, O // 2 + 1), np.float32)
    W0 = np.zeros((G, 2, O, O // 2), np.float32)
    for g in range(G):
        for a in range(2):
            for j in range(O):
                K = g * O + j
                for u in range(O // 2 + 1):
                    s = g * O - 1 + 2 * u
                    if 0 <= s < h2:
                        W1[g, a, j, u] = A[a, K, s]
                for u in range(O // 2):
                    s = g * O + 2 * u
                    if 0 <= s < h2:
                        W0[g, a, j, u] = A[a, K, s]
    return W1, W0, A[:, h2, h2 - 1].astype(np.float32)


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


def _direct_scatter_tensor() -> np.ndarray:
    """Constant [3, 3, 4, 4, 4] scatter: T[dy, dx, ry, rx, pq] = 1 iff
    full-res tap (dy, dx) of output phase pq = (p*2+q) reads input pixel
    row/col offset (ry, rx) = (p + dy, q + dx) of the 4x4 stride-2 window
    anchored at (2I - 1, 2J - 1)."""
    T = np.zeros((3, 3, 4, 4, 4), np.float32)
    for p in range(2):
        for q in range(2):
            for dy in range(3):
                for dx in range(3):
                    T[dy, dx, p + dy, q + dx, p * 2 + q] = 1.0
    return T


def _fold_conv_direct(w) -> jnp.ndarray:
    """[3, 3, cin, cout] full-res conv -> [4, 4, cin, 4*cout] stride-2 conv
    over the UNPACKED input (pad (1, 1) per spatial dim).

    Composes _pack_conv_weights with the identity packing: the packed-
    lattice term conv2x2(pack_feature(x), w_packed) equals
    conv4x4_stride2(pad(x, 1), w_direct) — output cell (I, J) phase (p, q)
    = full-res pixel (2I+p, 2J+q), whose tap (dy, dx) reads pixel row
    2I + p + dy - 1 = (window anchor 2I-1) + (p + dy). Folding skips
    materializing the packed operand entirely — the pack op alone costs
    7-13 ms per tensor at batch 128 (measured: pack_feature on
    [128,240,320,64] = 12.7 ms; the whole packed tail is 93 ms)."""
    w = jnp.asarray(w, jnp.float32)
    cin, cout = w.shape[2], w.shape[3]
    T = jnp.asarray(_direct_scatter_tensor())
    wd = jnp.einsum("yxio,yxrsv->rsivo", w, T)
    return wd.reshape(4, 4, cin, 4 * cout)


def _conv_skip_direct(x: jnp.ndarray, w_direct: jnp.ndarray, dtype,
                      acc_t) -> jnp.ndarray:
    """Stride-2 4x4 conv computing the skip/image term of a packed stage
    directly from the unpacked tensor (see _fold_conv_direct)."""
    return jax.lax.conv_general_dilated(
        x.astype(dtype), w_direct.astype(dtype), (2, 2),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=acc_t)


def _pack_identity_kernel(c: int) -> np.ndarray:
    """[2, 2, c, 4c] identity strided-conv kernel: s2d of a padded tensor,
    output channel order phase-major (a*2+b)*c + ch."""
    k = np.zeros((2, 2, c, 4 * c), np.float32)
    for a in range(2):
        for b in range(2):
            for ch in range(c):
                k[a, b, ch, (a * 2 + b) * c + ch] = 1.0
    return k


def _pack_image_kernel() -> np.ndarray:
    """[2, 2, 3, 12] identity strided-conv kernel: s2d of a padded image."""
    return _pack_identity_kernel(3)


def _fold_direct_to_packed3(w4: jnp.ndarray) -> jnp.ndarray:
    """Refold the stride-2 4x4 skip/image kernel [4, 4, cin, cout] for an
    ALIGNED space_to_depth2-packed input: [3, 3, 4*cin, cout], stride 1,
    pad (1, 1). Output row oy of the direct conv reads rows
    2oy - 1 + dy (dy in [0,4)) = packed cell oy + k - 1 phase a with
    dy = 2k + a - 1; only 16 of the 36 packed taps are nonzero, but cin
    is tiny (rgb) so the extra FLOPs are noise next to the layout win of
    never materializing a 3-channel full-res tensor."""
    S = np.zeros((3, 2, 4), np.float32)               # [k, phase, dy]
    for k in range(3):
        for a in range(2):
            d = 2 * k + a - 1
            if 0 <= d < 4:
                S[k, a, d] = 1.0
    Sj = jnp.asarray(S, w4.dtype)
    w3 = jnp.einsum("kad,lbe,deco->klabco", Sj, Sj, w4)
    cin, cout = w4.shape[2], w4.shape[3]
    return w3.reshape(3, 3, 4 * cin, cout)


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
    # rgb term: direct stride-2 conv over the image (no packed image)
    w_im = _fold_conv_direct(w_raw[:, :, cin_fm:, :])

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
    plus a concat of lane-padded operands. A two-tap shift+lerp
    formulation (the upsample only ever reads source rows K-1, K — see
    git history) was tried and REFUTED: 51.7 ms vs 17.5 ms for the raw
    stage at b128, because its phase-split intermediates put c=32 in the
    minor dim and relayout; the dense matmul pays an in_size-wide
    contraction but keeps every intermediate 64/128-lane aligned."""
    b, h2, w2, c = fm.shape
    Ah, Aw = _concrete(ah), _concrete(aw)
    Oh, Ow = _pick_block(h2), _pick_block(w2)
    if BLOCKED_UPSAMPLE and Ah is not None and Aw is not None \
            and Oh and Ow:
        fm = fm.astype(dtype)
        # H pass: [b, n, w2, a, c]
        G = h2 // Oh
        W1, wt = _blocked_weights_dense(Ah, Oh)
        fp = jnp.pad(fm, ((0, 0), (1, 0), (0, 0), (0, 0)))  # row -1 zero
        main = fp[:, :G * Oh].reshape(b, G, Oh, w2, c)
        halo = fp[:, Oh::Oh][:, :G, None]                   # src row gO+O-1
        S = jnp.concatenate([main, halo], axis=2)           # [b,G,O+1,w2,c]
        hi = jnp.einsum("gajt,bgtwc->bgjwac",
                        jnp.asarray(W1, dtype), S)
        hi = hi.reshape(b, G * Oh, w2, 2, c)
        tail = fm[:, -1:, :, None, :] * jnp.asarray(wt, dtype)[
            None, None, None, :, None]
        hi = jnp.concatenate([hi, tail], axis=1)            # [b,n,w2,a,c]
        # W pass: [b, n, m, a, B, c]
        n = h2 + 1
        Gw = w2 // Ow
        V1, vt = _blocked_weights_dense(Aw, Ow)
        hp = jnp.pad(hi, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
        mainw = hp[:, :, :Gw * Ow].reshape(b, n, Gw, Ow, 2, c)
        halow = hp[:, :, Ow::Ow][:, :, :Gw, None]
        Sw = jnp.concatenate([mainw, halow], axis=3)        # [b,n,G,O+1,a,c]
        up = jnp.einsum("gBLt,bngtac->bngLaBc",
                        jnp.asarray(V1, dtype), Sw)
        up = up.reshape(b, n, Gw * Ow, 2, 2, c)
        tailw = hi[:, :, -1:, :, None, :] * jnp.asarray(vt, dtype)[
            None, None, None, None, :, None]
        up = jnp.concatenate([up, tailw], axis=2)           # [b,n,m,a,B,c]
        return up.reshape(b, n, w2 + 1, 4 * c)
    fm = fm.astype(dtype)
    ah = ah.astype(dtype)
    aw = aw.astype(dtype)
    hi = jnp.einsum("aoh,bhwc->bowac", ah, fm)          # [b, h2+1, w2, 2, c]
    up = jnp.einsum("Bpw,bowac->bopaBc", aw, hi)        # [b,h2+1,w2+1,2,2,c]
    return up.reshape(b, ah.shape[1], aw.shape[1], 4 * c)


def pack_image(image: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[b, h, w, 3] -> [b, h/2+1, w/2+1, 12] on the shifted lattice."""
    return pack_feature(image, dtype)


def pack_feature(x: jnp.ndarray, dtype=jnp.bfloat16) -> jnp.ndarray:
    """[b, h, w, c] -> [b, h/2+1, w/2+1, 4c] on the shifted lattice:
    cell (K, L) phase (a, b) = full-res pixel (2K-1+a, 2L-1+b), zeros out
    of range (matching the SAME-padding of the conv this feeds)."""
    c = x.shape[-1]
    xp = jnp.pad(x.astype(dtype), ((0, 0), (1, 1), (1, 1), (0, 0)))
    k = jnp.asarray(_pack_identity_kernel(c), dtype)
    return jax.lax.conv_general_dilated(
        xp, k, (2, 2), [(0, 0), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))


def phase_upsample_from_packed(fmp: jnp.ndarray, ah: jnp.ndarray,
                               aw: jnp.ndarray, dtype=jnp.bfloat16
                               ) -> jnp.ndarray:
    """Packed-input variant of phase_upsample_packed.

    fmp: [b, h4, w4, 4c] — the PACKED form of an [b, 2*h4, 2*w4, c] tensor
    (plain-grid phases, channel order (py*2+px)*c + ch, e.g. the output of
    run_packed_conv2s). ah/aw are the same [2, n, 2*h4]-shaped shifted
    phase matrices fold_packed_tail builds; their source axis is split
    (Y, py) to contract directly against the packed layout, so the
    full-resolution rows still never materialize."""
    b, h4, w4, c4 = fmp.shape
    c = c4 // 4
    h2, w2 = 2 * h4, 2 * w4
    Ah, Aw = _concrete(ah), _concrete(aw)
    Oh, Ow = _pick_block(h2), _pick_block(w2)
    if BLOCKED_UPSAMPLE and Ah is not None and Aw is not None \
            and Oh and Ow:
        t = fmp.astype(dtype).reshape(b, h4, w4, 2, 2, c)
        # --- H pass: [b, n, X, px, a, c]
        G = h2 // Oh
        W1, W0, wt = _blocked_phase_weights(Ah, Oh)
        py0 = t[:, :, :, 0]                     # [b,h4,w4,px,c] even rows
        py1 = t[:, :, :, 1]                     # odd rows
        p1p = jnp.pad(py1, ((0, 0), (1, 0), (0, 0), (0, 0), (0, 0)))
        m1 = p1p[:, :G * (Oh // 2)].reshape(b, G, Oh // 2, w4, 2, c)
        h1 = p1p[:, Oh // 2::Oh // 2][:, :G, None]
        S1 = jnp.concatenate([m1, h1], axis=2)  # [b,G,O/2+1,w4,px,c]
        S0 = py0.reshape(b, G, Oh // 2, w4, 2, c)
        hi = (jnp.einsum("gaju,bguXxc->bgjXxac", jnp.asarray(W1, dtype), S1)
              + jnp.einsum("gaju,bguXxc->bgjXxac", jnp.asarray(W0, dtype),
                           S0))
        hi = hi.reshape(b, G * Oh, w4, 2, 2, c)
        wt_j = jnp.asarray(wt, dtype)
        tail = py1[:, -1:, :, :, None, :] * wt_j[None, None, None, None, :,
                                                 None]
        hi = jnp.concatenate([hi, tail], axis=1)  # [b,n,w4,px,a,c]
        n = h2 + 1
        # --- W pass: [b, n, m, a, B, c]
        Gw = w2 // Ow
        V1, V0, vt = _blocked_phase_weights(Aw, Ow)
        px0 = hi[:, :, :, 0]                    # [b,n,w4,a,c]
        px1 = hi[:, :, :, 1]
        q1p = jnp.pad(px1, ((0, 0), (0, 0), (1, 0), (0, 0), (0, 0)))
        mw1 = q1p[:, :, :Gw * (Ow // 2)].reshape(b, n, Gw, Ow // 2, 2, c)
        hw1 = q1p[:, :, Ow // 2::Ow // 2][:, :, :Gw, None]
        T1 = jnp.concatenate([mw1, hw1], axis=3)
        T0 = px0.reshape(b, n, Gw, Ow // 2, 2, c)
        up = (jnp.einsum("gBLu,bngusc->bngLsBc", jnp.asarray(V1, dtype), T1)
              + jnp.einsum("gBLu,bngusc->bngLsBc", jnp.asarray(V0, dtype),
                           T0))
        up = up.reshape(b, n, Gw * Ow, 2, 2, c)
        vt_j = jnp.asarray(vt, dtype)
        tailw = px1[:, :, -1:, :, None, :] * vt_j[None, None, None, None, :,
                                                  None]
        up = jnp.concatenate([up, tailw], axis=2)
        return up.reshape(b, n, w2 + 1, 4 * c)
    fmr = fmp.astype(dtype).reshape(b, h4, w4, 2, 2, c)
    ah_r = ah.astype(dtype).reshape(2, ah.shape[1], h4, 2)
    aw_r = aw.astype(dtype).reshape(2, aw.shape[1], w4, 2)
    hi = jnp.einsum("aoYy,bYXyxc->boXxac", ah_r, fmr)
    up = jnp.einsum("BpXx,boXxac->bopaBc", aw_r, hi)
    return up.reshape(b, ah.shape[1], aw.shape[1], 4 * c)


class PackedStageParams(NamedTuple):
    """Folded inference parameters of one packed decoder stage
    (upsample + 3x3 SAME conv over concat([fm, skip]) + BN + LeakyReLU)."""
    ah: jnp.ndarray       # [2, h/2+1, h/2] shifted-phase h-interp matrices
    aw: jnp.ndarray       # [2, w/2+1, w/2] shifted-phase w-interp
    w_fm: jnp.ndarray     # [2, 2, 4*c_fm, 4*cout] packed conv (decoder fm)
    w_skip: jnp.ndarray   # [4, 4, c_skip, 4*cout] direct stride-2 conv
    scale4: jnp.ndarray   # [4*cout] phase-tiled BN scale
    bias4: jnp.ndarray    # [4*cout] phase-tiled BN bias


def fold_packed_stage(w, bn_scale, bn_bias, bn_mean, bn_var,
                      c_fm: int, h: int, w_: int,
                      eps: float = 1e-5) -> PackedStageParams:
    """Fold one decoder stage (ref model_repository.py:38-51: a 3x3 SAME
    conv over concat([2x-upsampled decoder features, backbone skip]) + BN
    + LeakyReLU) into packed-lattice parameters. Works for both the 4s
    stage (Conv_2, skip = x4s) and the 2s stage (Conv_3, skip = x2s).

    w: [3, 3, c_fm + c_skip, cout] with the model's concat order
    (decoder features first, then the skip — models/pvnet.py:154-161).
    (h, w_): THIS stage's output resolution (= 2x the incoming fm's).
    """
    w = jnp.asarray(w, jnp.float32)
    w_fm = _pack_conv_weights(w[:, :, :c_fm, :])
    w_skip = _fold_conv_direct(w[:, :, c_fm:, :])

    inv = jax.lax.rsqrt(jnp.asarray(bn_var, jnp.float32) + eps)
    scale = jnp.asarray(bn_scale, jnp.float32) * inv
    bias = (jnp.asarray(bn_bias, jnp.float32)
            - jnp.asarray(bn_mean, jnp.float32) * scale)

    return PackedStageParams(
        ah=jnp.asarray(_shifted_phase_matrices(h, h // 2)),
        aw=jnp.asarray(_shifted_phase_matrices(w_, w_ // 2)),
        w_fm=w_fm,
        w_skip=w_skip,
        scale4=jnp.tile(scale, 4),
        bias4=jnp.tile(bias, 4),
    )


# backwards-compatible aliases (the first packed stage built was conv2s)
PackedConv2sParams = PackedStageParams
fold_packed_conv2s = fold_packed_stage


def run_packed_stage(fm: jnp.ndarray, skip: jnp.ndarray,
                     cp: PackedStageParams, alpha: float = 0.1,
                     dtype=jnp.bfloat16,
                     fm_packed: bool = False,
                     quant: bool = False) -> jnp.ndarray:
    """One packed decoder stage.

    Args:
      fm:   [b, hc, wc, c_fm] incoming decoder activation (pre-upsample),
            or — with fm_packed=True — its packed form
            [b, hc/2, wc/2, 4*c_fm] as a previous run_packed_stage emits.
      skip: [b, 2*hc, 2*wc, c_skip] backbone skip features at this
            stage's resolution.
    Returns the packed stage activation [b, hc, wc, 4*cout] (plain-grid
    phases, channel order (p*2+q)*cout + ch) — what
    phase_upsample_from_packed and fm_packed=True consume, so the
    full-resolution activation never materializes. Same floating-point
    operators as the plain path: the upsample-then-SAME-conv is
    algebraically a VALID 2x2 conv between the shifted input lattice and
    the output lattice."""
    if fm_packed:
        up = phase_upsample_from_packed(fm, cp.ah, cp.aw, dtype)
    else:
        up = phase_upsample_packed(fm, cp.ah, cp.aw, dtype)
    if quant:
        # int8 both convs (ops/quant_conv.conv2d_int8). REFUTED for
        # throughput on this backend (measure, don't assume): the int8
        # 2x2 conv at the tail shape [128, 241, 321, 128] is SLOWER than
        # bf16 — 38.4 ms (static scale) / 43.1 ms (dynamic) vs 23.3 ms —
        # XLA's int8 conv lowering only beats bf16 for the 3x3 dilated
        # backbone shapes (ops/quant_conv.py); e2e --quant_tail measured
        # 513 vs 738 poses/s. Kept as an accuracy-tested option (median
        # 0.055 px vs float), default off everywhere. NOTE: this path is
        # dynamic-scale ONLY (s_x=None -> per-image absmax); the tail is
        # functional code outside the flax 'quant' collection, so static
        # calibrated scales are not plumbed here — the static 38.4 ms
        # figure above was measured with a hand-fed scalar in
        # tools/bench_packed_tail.py, not via this entry point.
        from pvnet_tpu.ops.quant_conv import conv2d_int8
        acc_t = jnp.float32
        y = conv2d_int8(up, cp.w_fm)
        y = y + conv2d_int8(skip, cp.w_skip, (2, 2), ((1, 1), (1, 1)))
    else:
        acc_t = jnp.float32 if dtype == jnp.float32 else dtype
        y = jax.lax.conv_general_dilated(
            up, cp.w_fm.astype(dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_t)
        # skip term reads the unpacked skip directly (_fold_conv_direct)
        y = y + _conv_skip_direct(skip, cp.w_skip, dtype, acc_t)
    y = y * cp.scale4.astype(acc_t) + cp.bias4.astype(acc_t)
    y = jnp.where(y > 0, y, jnp.asarray(alpha, acc_t) * y)
    return y.astype(dtype)


run_packed_conv2s = run_packed_stage


def run_packed_tail(fm: jnp.ndarray, image: jnp.ndarray,
                    tp: PackedTailParams, alpha: float = 0.1,
                    dtype=jnp.bfloat16, out_dtype=jnp.float32,
                    fm_packed: bool = False,
                    quant: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Packed tail forward.

    Args:
      fm:    [b, h2, w2, s2dim] 2s-stage decoder features (pre-upsample),
             or — with fm_packed=True — their packed form
             [b, h2/2, w2/2, 4*s2dim] as run_packed_conv2s emits.
      image: [b, h, w, 3] normalized input (h = 2*h2, w = 2*w2).
    Returns:
      packed: [b, h2, w2, 4*hout] packed head fields, phase order (p*2+q).
      fgcnt:  [b, h2, w2] float32 foreground sub-pixel count per cell.
    """
    if fm_packed:
        up = phase_upsample_from_packed(fm, tp.ah, tp.aw, dtype)
    else:
        up = phase_upsample_packed(fm, tp.ah, tp.aw, dtype)  # [b,h2+1,w2+1,4c]

    if quant:
        # int8 feature-term conv (the tail's dominant MXU op); the rgb
        # term below stays float — cin=3, FLOP-wise noise
        from pvnet_tpu.ops.quant_conv import conv2d_int8
        acc_t = jnp.float32
        y = conv2d_int8(up, tp.w_fm)
    else:
        # accumulate in f32 (MXU default for bf16 inputs) but emit the
        # compute dtype: the f32 [b, h2, w2, 4c] round trip costs a full
        # extra pass
        acc_t = jnp.float32 if dtype == jnp.float32 else dtype
        y = jax.lax.conv_general_dilated(
            up, tp.w_fm.astype(dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_t)
    # rgb term: direct stride-2 conv on full-res rgb, or — for an
    # already-packed [b, h2, w2, 12] image (packed-stem pipelines) — the
    # refolded 3x3 on the packed lattice (see _fold_direct_to_packed3)
    if image.shape[-1] == 12:
        y = y + jax.lax.conv_general_dilated(
            image.astype(dtype),
            _fold_direct_to_packed3(tp.w_im).astype(dtype), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=acc_t)
    else:
        y = y + _conv_skip_direct(image, tp.w_im, dtype, acc_t)

    y = y * tp.scale4.astype(acc_t) + tp.bias4.astype(acc_t)
    y = jnp.where(y > 0, y, jnp.asarray(alpha, acc_t) * y)
    packed = (y.astype(dtype) @ tp.w_head4.astype(dtype)
              ).astype(jnp.float32) + tp.b_head4            # [b,h2,w2,4h]

    hout = tp.b_head4.shape[0] // 4
    rows = packed.reshape(packed.shape[:3] + (4, hout))
    fgcnt = jnp.sum(rows[..., 1] > rows[..., 0], axis=-1).astype(jnp.float32)
    return packed.astype(out_dtype), fgcnt


def packed_tail_from_variables(variables, fm, image, alpha: float = 0.1,
                               dtype=jnp.bfloat16, out_dtype=None,
                               quant: bool = False):
    """Convenience: fold PVNet raw-stage variables (Conv_4/BatchNorm_4/
    Conv_5, models/pvnet.py naming) and run the packed tail."""
    p = variables["params"]
    bn = variables["batch_stats"]["BatchNorm_4"]
    b, ih, iw, ic = image.shape
    h, w = (2 * ih, 2 * iw) if ic == 12 else (ih, iw)
    tp = fold_packed_tail(
        p["Conv_4"]["kernel"], p["BatchNorm_4"]["scale"],
        p["BatchNorm_4"]["bias"], bn["mean"], bn["var"],
        p["Conv_5"]["kernel"], p["Conv_5"].get("bias"),
        h, w, fm.shape[1], fm.shape[2])
    if out_dtype is None:
        out_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    return run_packed_tail(fm, image, tp, alpha=alpha, dtype=dtype,
                           out_dtype=out_dtype, quant=quant)


def packed_tail_deep_from_variables(variables, fm4, x2s, image,
                                    alpha: float = 0.1,
                                    dtype=jnp.bfloat16, out_dtype=None,
                                    quant: bool = False):
    """Convenience: fold BOTH the 2s decoder stage (Conv_3/BatchNorm_3,
    models/pvnet.py naming) and the raw tail (Conv_4/BatchNorm_4/Conv_5),
    then run 4s features -> packed head fields with every intermediate on
    a 128-aligned packed lattice (the full-resolution 2s activation and
    seg/ver tensors never materialize).

    fm4: [b, h4, w4, s4dim] 4s-stage activation; x2s: [b, 2h4, 2w4, c]
    backbone skip (both from apply(..., return_4s_features=True))."""
    p = variables["params"]
    bs = variables["batch_stats"]
    b, ih, iw, ic = image.shape
    h, w = (2 * ih, 2 * iw) if ic == 12 else (ih, iw)
    h2, w2 = x2s.shape[1], x2s.shape[2]
    cp = fold_packed_stage(
        p["Conv_3"]["kernel"], p["BatchNorm_3"]["scale"],
        p["BatchNorm_3"]["bias"], bs["BatchNorm_3"]["mean"],
        bs["BatchNorm_3"]["var"], fm4.shape[-1], h2, w2)
    fm2p = run_packed_stage(fm4, x2s, cp, alpha=alpha, dtype=dtype,
                            quant=quant)
    tp = fold_packed_tail(
        p["Conv_4"]["kernel"], p["BatchNorm_4"]["scale"],
        p["BatchNorm_4"]["bias"], bs["BatchNorm_4"]["mean"],
        bs["BatchNorm_4"]["var"],
        p["Conv_5"]["kernel"], p["Conv_5"].get("bias"),
        h, w, h2, w2)
    if out_dtype is None:
        out_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    return run_packed_tail(fm2p, image, tp, alpha=alpha, dtype=dtype,
                           out_dtype=out_dtype, fm_packed=True, quant=quant)


def packed_tail_deep3_from_variables(variables, fm8, x4s, x2s, image,
                                     alpha: float = 0.1,
                                     dtype=jnp.bfloat16, out_dtype=None,
                                     quant: bool = False):
    """Deepest packed path: fold the 4s stage (Conv_2/BatchNorm_2), the 2s
    stage (Conv_3/BatchNorm_3) and the raw tail, then run 8s features ->
    packed head fields entirely on 128-aligned packed lattices. The
    decoder above this (fc + 8s stage) already has 128-multiple channels,
    so depth 3 is where packing naturally stops.

    fm8: [b, h8, w8, s8dim] 8s-stage activation (pre-upsample); x4s/x2s:
    backbone skips (all from apply(..., return_8s_features=True))."""
    p = variables["params"]
    bs = variables["batch_stats"]
    b, ih, iw, ic = image.shape
    h, w = (2 * ih, 2 * iw) if ic == 12 else (ih, iw)
    h2, w2 = x2s.shape[1], x2s.shape[2]
    cp4 = fold_packed_stage(
        p["Conv_2"]["kernel"], p["BatchNorm_2"]["scale"],
        p["BatchNorm_2"]["bias"], bs["BatchNorm_2"]["mean"],
        bs["BatchNorm_2"]["var"], fm8.shape[-1],
        x4s.shape[1], x4s.shape[2])
    fm4p = run_packed_stage(fm8, x4s, cp4, alpha=alpha, dtype=dtype,
                            quant=quant)
    s4dim = p["Conv_2"]["kernel"].shape[3]
    cp2 = fold_packed_stage(
        p["Conv_3"]["kernel"], p["BatchNorm_3"]["scale"],
        p["BatchNorm_3"]["bias"], bs["BatchNorm_3"]["mean"],
        bs["BatchNorm_3"]["var"], s4dim, h2, w2)
    fm2p = run_packed_stage(fm4p, x2s, cp2, alpha=alpha, dtype=dtype,
                            fm_packed=True, quant=quant)
    tp = fold_packed_tail(
        p["Conv_4"]["kernel"], p["BatchNorm_4"]["scale"],
        p["BatchNorm_4"]["bias"], bs["BatchNorm_4"]["mean"],
        bs["BatchNorm_4"]["var"],
        p["Conv_5"]["kernel"], p["Conv_5"].get("bias"),
        h, w, h2, w2)
    if out_dtype is None:
        out_dtype = jnp.float32 if dtype == jnp.float32 else dtype
    return run_packed_tail(fm2p, image, tp, alpha=alpha, dtype=dtype,
                           out_dtype=out_dtype, fm_packed=True, quant=quant)
