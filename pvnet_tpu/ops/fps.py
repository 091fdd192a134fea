"""Farthest point sampling (offline keypoint generation).

Replaces the reference's CFFI C++ FPS
(ref lib/utils/extend_utils/src/farthest_point_sampling.cpp:77-160): same
O(KN) algorithm, same init-center variant that seeds from the point nearest
the bbox center then discards it from the output — used to generate the
farthest{N}.txt keypoint files (ref data_utils.py:140-152).

Dispatches to the native C++ library (pvnet_tpu.native) when built; the
numpy fallback is identical and fast enough for offline prep.
"""
from __future__ import annotations

import numpy as np


def _fps_numpy(pts: np.ndarray, sn: int, init_center: bool) -> np.ndarray:
    pn = pts.shape[0]
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    if init_center:
        # min_dist seeded from the bbox center, first pick = farthest from
        # it (ref fps.cpp:122-160); the center itself is never emitted
        center = (pts.min(0) + pts.max(0)) / 2.0
        dist = np.sum((pts - center) ** 2, axis=1)
    else:
        # the reference seeds from a random point (srand(time)); use index 0
        # for reproducibility — FPS output is insensitive to the seed point
        first = 0
        dist = np.sum((pts - pts[first]) ** 2, axis=1)
    idxs = []
    if not init_center:
        idxs.append(first)
    while len(idxs) < sn:
        nxt = int(np.argmax(dist))
        idxs.append(nxt)
        dist = np.minimum(dist, np.sum((pts - pts[nxt]) ** 2, axis=1))
    return pts[np.asarray(idxs, np.int64)]


def farthest_point_sampling(pts: np.ndarray, sn: int,
                            init_center: bool = False) -> np.ndarray:
    """Sample sn farthest points from pts [n, 3]. Returns [sn, 3]."""
    try:
        from pvnet_tpu import native
        if native.available():
            return native.farthest_point_sampling(pts, sn, init_center)
    except ImportError:
        pass
    return _fps_numpy(pts, sn, init_center)
