"""Pallas TPU kernels for per-row / per-column circular integer shifts.

``shift_lanes(x, starts)``    : y[p, r, c] = x[p, r, (starts[p, r] + c) % C]
``shift_sublanes(x, starts)`` : y[p, i, c] = x[p, (starts[p, c] + i) % H, c]

Why a kernel: XLA lowers a per-row windowed ``take_along_axis`` to a
serial per-index gather on this backend (measured 68.6 ms for a 20 MB
[16, 480, 640] shift, tools/bench_gather.py --pieces row) even though the
access pattern is a contiguous window per row. Here the shift runs as a
log2(N)-step binary decomposition: for each bit j of the shift amount,
circular-roll the whole block by 2^j along the shifted axis (a static,
fully vectorized lane/sublane rotation) and select rolled-vs-not per
row/column with the shift's j-th bit. ~log2(N) roll+select passes over
VMEM-resident data, no per-element indexing anywhere.

The shifts are CIRCULAR by design: the consumer (the separable affine
warp in data/augment_device.py) computes sample validity from the true
un-wrapped position and zeroes out-of-range outputs, so wrap-around reads
are exactly as good as zero padding — this removes the physical pad and
window clamping a windowed (non-circular) shift would need.

Mosaic block-shape rules shape the layout (last two block dims must be
divisible by (8, 128) or equal the full dim): ``shift_lanes`` flattens
[P, R, C] -> [P*R, C] so rows tile the sublane axis and ``starts`` rides
as a [N, 1] column; ``shift_sublanes`` tiles 8 planes x 128 columns per
block with the full H axis resident.

No reference counterpart: the reference's augmentation runs cv2.warpAffine
on the host (ref lib/datasets/augmentation.py); this is TPU-native input
pipeline machinery.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _roll_neg(x: jnp.ndarray, k: int, axis: int) -> jnp.ndarray:
    """Circular roll so that out[i] = x[(i + k) % n] along ``axis``
    (jnp.roll with shift=-k), written as two static slices + concat —
    Mosaic lowers this to vector rotations, and it also runs under
    pallas interpret mode."""
    n = x.shape[axis]
    k = k % n
    if k == 0:
        return x
    lo = jax.lax.slice_in_dim(x, k, n, axis=axis)
    hi = jax.lax.slice_in_dim(x, 0, k, axis=axis)
    return jax.lax.concatenate([lo, hi], dimension=axis)


def _bits_for(n: int) -> int:
    return max(1, (n - 1).bit_length())


def _use_xla_fallback(interpret) -> bool:
    # The Mosaic kernel compiles only on TPU. On other backends (the CPU
    # test mesh) the default routes to a plain XLA wrapped gather — fast
    # there, and pallas interpret mode would python-loop over the grid.
    # Pass interpret=True to force the kernel through interpret mode
    # (the kernel-logic tests do).
    return interpret is None and jax.default_backend() != "tpu"


def _lanes_kernel(s_ref, x_ref, o_ref, *, bits: int):
    x = x_ref[...]                                 # [rt, C]
    s = s_ref[...]                                 # [rt, 1]
    acc = x
    for j in range(bits):
        rolled = _roll_neg(acc, 1 << j, axis=1)
        cond = ((s >> j) & 1) == 1                 # [rt, 1] -> bcast lanes
        acc = jnp.where(cond, rolled, acc)
    o_ref[...] = acc


def shift_lanes(x: jnp.ndarray, starts: jnp.ndarray,
                row_tile: int = 256, interpret=None) -> jnp.ndarray:
    """y[p, r, c] = x[p, r, (starts[p, r] + c) % C].

    x: [P, R, C] (f32/i32/u32 tested; C a multiple of 128 avoids lane
    padding), starts: [P, R] any int dtype (reduced mod C here).
    """
    P, R, C = x.shape
    if _use_xla_fallback(interpret):
        idx = jnp.mod(starts.astype(jnp.int32)[..., None]
                      + jnp.arange(C, dtype=jnp.int32), C)
        return jnp.take_along_axis(x, idx, axis=2)
    interpret = bool(interpret)
    N = P * R
    xf = x.reshape(N, C)
    sf = jnp.mod(starts.astype(jnp.int32), C).reshape(N, 1)
    rt = min(row_tile, N)
    Np = -(-N // rt) * rt
    if Np != N:
        xf = jnp.pad(xf, ((0, Np - N), (0, 0)))
        sf = jnp.pad(sf, ((0, Np - N), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lanes_kernel, bits=_bits_for(C)),
        grid=(Np // rt,),
        in_specs=[
            pl.BlockSpec((rt, 1), lambda t: (t, 0)),
            pl.BlockSpec((rt, C), lambda t: (t, 0)),
        ],
        out_specs=pl.BlockSpec((rt, C), lambda t: (t, 0)),
        out_shape=jax.ShapeDtypeStruct((Np, C), x.dtype),
        interpret=interpret,
    )(sf, xf)
    if Np != N:
        out = out[:N]
    return out.reshape(P, R, C)


def _sublanes_kernel(s_ref, x_ref, o_ref, *, bits: int):
    x = x_ref[...]                                 # [pt, H, ct]
    s = s_ref[...]                                 # [pt, ct]
    acc = x
    for j in range(bits):
        rolled = _roll_neg(acc, 1 << j, axis=1)
        cond = (((s >> j) & 1) == 1)[:, None, :]   # [pt, 1, ct]
        acc = jnp.where(cond, rolled, acc)
    o_ref[...] = acc


def shift_sublanes(x: jnp.ndarray, starts: jnp.ndarray,
                   plane_tile: int = 8, col_tile: int = 128,
                   interpret=None) -> jnp.ndarray:
    """y[p, i, c] = x[p, (starts[p, c] + i) % H, c].

    x: [P, H, C], starts: [P, C] any int dtype. The full H axis stays
    block-resident (the roll wraps over true H), planes x columns tile.
    """
    P, H, C = x.shape
    if _use_xla_fallback(interpret):
        idx = jnp.mod(starts.astype(jnp.int32)[:, None, :]
                      + jnp.arange(H, dtype=jnp.int32)[None, :, None], H)
        return jnp.take_along_axis(x, idx, axis=1)
    interpret = bool(interpret)
    starts = jnp.mod(starts.astype(jnp.int32), H)
    pt = min(plane_tile, P) if P % min(plane_tile, P) == 0 else 1
    ct = min(col_tile, C)
    Pp = -(-P // pt) * pt
    Cp = -(-C // ct) * ct
    if Pp != P or Cp != C:
        x = jnp.pad(x, ((0, Pp - P), (0, 0), (0, Cp - C)))
        starts = jnp.pad(starts, ((0, Pp - P), (0, Cp - C)))
    out = pl.pallas_call(
        functools.partial(_sublanes_kernel, bits=_bits_for(H)),
        grid=(Pp // pt, Cp // ct),
        in_specs=[
            pl.BlockSpec((pt, ct), lambda p, t: (p, t)),
            pl.BlockSpec((pt, H, ct), lambda p, t: (p, 0, t)),
        ],
        out_specs=pl.BlockSpec((pt, H, ct), lambda p, t: (p, 0, t)),
        out_shape=jax.ShapeDtypeStruct((Pp, H, Cp), x.dtype),
        interpret=interpret,
    )(starts, x)
    if Pp != P or Cp != C:
        out = out[:P, :, :C]
    return out
