"""Native C++ host-side kernels (ctypes-loaded shared library).

TPU-native counterpart of the reference's CFFI extension suite
(ref lib/utils/extend_utils/): farthest point sampling, brute-force nearest
neighbor, and mesh rasterization as C++ compiled by ``make -C
pvnet_tpu/native``. All entry points have numpy fallbacks in
``pvnet_tpu.ops``; :func:`available` reports whether the shared library is
loaded.
"""
from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    path = os.path.join(os.path.dirname(__file__), "libpvnet_native.so")
    if os.path.exists(path):
        try:
            lib = ctypes.CDLL(path)
            lib.fps_sample.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_int)]
            lib.nearest_neighbor_idx.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int,
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.POINTER(ctypes.c_int)]
            lib.rasterize_binary.argtypes = [
                ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
                ctypes.c_int, ctypes.POINTER(ctypes.c_ubyte)]
            _LIB = lib
        except OSError:
            _LIB = None
    return _LIB


def available() -> bool:
    return _load() is not None


def farthest_point_sampling(pts: np.ndarray, sn: int,
                            init_center: bool = False) -> np.ndarray:
    lib = _load()
    pts = np.ascontiguousarray(pts[:, :3], np.float32)
    idxs = np.zeros(sn, np.int32)
    lib.fps_sample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), pts.shape[0],
        sn, 1 if init_center else 0,
        idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return pts[idxs]


def find_nearest_point_idx(ref_pts: np.ndarray, que_pts: np.ndarray
                           ) -> np.ndarray:
    """For each query point the index of its nearest reference point
    (ref extend_utils.py:39-60 API)."""
    lib = _load()
    dim = ref_pts.shape[1]
    ref_pts = np.ascontiguousarray(ref_pts, np.float32)
    que_pts = np.ascontiguousarray(que_pts, np.float32)
    idxs = np.zeros(que_pts.shape[0], np.int32)
    lib.nearest_neighbor_idx(
        ref_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        ref_pts.shape[0],
        que_pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        que_pts.shape[0], dim,
        idxs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    return idxs


def mesh_binary_rasterization(triangles_2d: np.ndarray, h: int, w: int
                              ) -> np.ndarray:
    lib = _load()
    tri = np.ascontiguousarray(triangles_2d, np.float32)
    mask = np.zeros((h, w), np.uint8)
    lib.rasterize_binary(
        tri.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), tri.shape[0],
        h, w, mask.ctypes.data_as(ctypes.POINTER(ctypes.c_ubyte)))
    return mask
