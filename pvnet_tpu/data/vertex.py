"""Per-pixel keypoint vector-field target generation.

The reference computes unit vectors pixel->keypoint on the host per sample in
O(h*w*k) numpy (ref lib/datasets/linemod_dataset.py:68-81,
compute_vertex_hcoords) inside 12 worker processes. Here the same math
exists twice:

- :func:`compute_vertex_targets_np` — host fallback, identical semantics.
- :func:`compute_vertex_targets` — one jnp broadcast, runs on device inside
  the jitted train step so the host pipeline only ships (rgb, mask, hcoords),
  cutting host CPU and host->device bytes per sample by ~2*K.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def compute_vertex_targets_np(mask: np.ndarray, hcoords: np.ndarray,
                              use_motion: bool = False) -> np.ndarray:
    """Host reference implementation (ref linemod_dataset.py:68-81).

    Args:
      mask:    [h, w] foreground mask (1 = object).
      hcoords: [k, 3] homogeneous 2D keypoints (x, y, w).
      use_motion: if True store raw offsets instead of unit vectors.

    Returns:
      [h, w, k*2] float32, zero outside the mask.
    """
    h, w = mask.shape
    m = hcoords.shape[0]
    xy = np.argwhere(mask == 1)[:, [1, 0]]
    vertex = xy[:, None, :] * hcoords[None, :, 2:]
    vertex = hcoords[None, :, :2] - vertex
    if not use_motion:
        norm = np.linalg.norm(vertex, axis=2, keepdims=True)
        norm[norm < 1e-3] += 1e-3
        vertex = vertex / norm
    out = np.zeros([h, w, m, 2], np.float32)
    out[xy[:, 1], xy[:, 0]] = vertex
    return np.reshape(out, [h, w, m * 2])


def compute_vertex_targets(mask: jnp.ndarray, hcoords: jnp.ndarray,
                           use_motion: bool = False,
                           layout: str = "NHWC") -> jnp.ndarray:
    """Device implementation, batched.

    Args:
      mask:    [b, h, w]
      hcoords: [b, k, 3]
      layout:  'NHWC' -> [b, h, w, k*2]; 'NCHW' -> [b, k*2, h, w] with the
        same channel order (x0, y0, x1, y1, ...) the NCHW model head emits.
        The NCHW form keeps w as the minor dim (dense lanes); the NHWC
        form's minor dim k*2=18 is lane-padded ~7x in HBM.
    Returns:
      float32 vector field, zero outside the mask.
    """
    b, h, w = mask.shape
    k = hcoords.shape[1]
    if layout == "NCHW":
        xs = jnp.arange(w, dtype=jnp.float32)[None, None, None, :]
        ys = jnp.arange(h, dtype=jnp.float32)[None, None, :, None]
        hx = hcoords[:, :, 0, None, None]                       # [b,k,1,1]
        hy = hcoords[:, :, 1, None, None]
        hw = hcoords[:, :, 2, None, None]
        vx = hx - xs * hw                                       # [b,k,h,w]
        vy = hy - ys * hw
        if not use_motion:
            norm = jnp.sqrt(vx * vx + vy * vy)
            norm = jnp.where(norm < 1e-3, norm + 1e-3, norm)
            vx = vx / norm
            vy = vy / norm
        v = jnp.stack([vx, vy], axis=2)                         # [b,k,2,h,w]
        v = v * (mask == 1)[:, None, None]
        return v.reshape(b, k * 2, h, w)
    xs = jnp.arange(w, dtype=jnp.float32)[None, None, :, None]   # [1,1,w,1]
    ys = jnp.arange(h, dtype=jnp.float32)[None, :, None, None]   # [1,h,1,1]
    hx = hcoords[:, None, None, :, 0]                            # [b,1,1,k]
    hy = hcoords[:, None, None, :, 1]
    hw = hcoords[:, None, None, :, 2]
    vx = hx - xs * hw                                            # [b,h,w,k]
    vy = hy - ys * hw
    if not use_motion:
        norm = jnp.sqrt(vx * vx + vy * vy)
        norm = jnp.where(norm < 1e-3, norm + 1e-3, norm)
        vx = vx / norm
        vy = vy / norm
    v = jnp.stack([vx, vy], axis=-1)                             # [b,h,w,k,2]
    v = v * (mask == 1)[..., None, None]
    return v.reshape(b, h, w, k * 2)


def compute_vertex_targets_multiclass(mask: jnp.ndarray,
                                      hcoords: jnp.ndarray) -> jnp.ndarray:
    """Multi-class field targets: one SHARED [b, h, w, k*2] field where
    each pixel's vectors point at the keypoints of its OWN class — the
    semantics the multi-class voting layer assumes (it votes class c on
    the pixels labeled c over the shared field, ref
    ransac_voting_gpu.py:10-97; ops/voting.ransac_voting_multiclass).

    Args:
      mask:    [b, h, w] integer labels, 0 = background, 1..C = classes.
      hcoords: [b, C, k, 3] per-class homogeneous keypoints.
    Returns:
      [b, h, w, k*2] float32, zero outside every class.
    """
    b, h, w = mask.shape
    n_cls, k = hcoords.shape[1], hcoords.shape[2]
    out = jnp.zeros((b, h, w, k * 2), jnp.float32)
    for c in range(n_cls):   # static unroll; class regions are disjoint
        out = out + compute_vertex_targets(
            (mask == c + 1).astype(jnp.int32), hcoords[:, c])
    return out
