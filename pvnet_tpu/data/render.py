"""Synthetic render-set generation utilities (ref lib/utils/render_utils.py).

The reference's render set comes from shelling out to a Blender binary with
a driver script (ref render_utils.py:243-260; the blender-side script is
absent from the snapshot and lives in the sibling pvnet-rendering repo).
This module provides:

- :class:`DataStatistics` — pose statistics of the real training set and
  KDE sampling of new (azimuth, elevation, theta) triples
  (ref render_utils.py:22-120), with a self-contained 'szxz' euler
  decomposition replacing transforms3d.
- :func:`sample_sphere` — evenly distributed viewpoints via the fibonacci
  sphere (ref render_utils.py:90-108).
- :class:`PythonRenderer` — a Blender-free fallback that renders
  (rgb, depth, mask) with the numpy z-buffer rasterizer so render-set
  style training data can be produced anywhere.
- :class:`BlenderRenderer` — the external-binary driver, gated on the
  binary existing.
- :func:`generate_occlusion_masks` — per-class masks by depth-rendering
  all objects and z-buffer compositing (ref data_utils.py:788-860).
"""
from __future__ import annotations

import os
import pickle
import subprocess
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from pvnet_tpu.config import BLENDER_K, LINEMOD_K, PathConfig
from pvnet_tpu.data.linemod import LineModModelDB
from pvnet_tpu.ops.rasterize import render_mesh_depth


def mat2euler_szxz(R: np.ndarray) -> Tuple[float, float, float]:
    """Euler angles (radians) for the 'szxz' convention:
    R = Rz(a1) @ Rx(a2) @ Rz(a3) — the convention the reference uses for
    blender pose statistics (ref base_utils.py:177-182 via transforms3d)."""
    sy = np.sqrt(R[0, 2] ** 2 + R[1, 2] ** 2)
    if sy > 1e-8:
        a1 = np.arctan2(R[0, 2], -R[1, 2])
        a2 = np.arctan2(sy, R[2, 2])
        a3 = np.arctan2(R[2, 0], R[2, 1])
    else:
        a1 = np.arctan2(-R[1, 0], R[0, 0])
        a2 = 0.0 if R[2, 2] > 0 else np.pi
        a3 = 0.0
    return a1, a2, a3


def blender_pose_to_blender_euler(pose: np.ndarray) -> np.ndarray:
    """(ref base_utils.py:177-182): degrees with the reference's offsets."""
    euler = [r / np.pi * 180 for r in mat2euler_szxz(pose[:, :3])]
    euler[0] = -(euler[0] + 90) % 360
    euler[1] = euler[1] - 90
    return np.array(euler)


def sample_sphere(num_samples: int, begin_elevation: float = 0.0
                  ) -> Tuple[np.ndarray, np.ndarray]:
    """Evenly distributed azimuths/elevations via the fibonacci sphere
    (ref render_utils.py:90-108). Returns (azimuths, elevations) deg."""
    ratio = (begin_elevation + 90) / 180
    num_points = int(num_samples // (1 - ratio))
    phi = (np.sqrt(5) - 1) / 2
    azimuths, elevations = [], []
    for n in range(num_points - num_samples, num_points):
        z = 2.0 * n / num_points + 1.0 / num_points - 1.0
        azimuths.append(np.rad2deg(2 * np.pi * n * phi % (2 * np.pi)))
        elevations.append(np.rad2deg(np.arcsin(np.clip(z, -1, 1))))
    return np.array(azimuths), np.array(elevations)


class DataStatistics:
    """Real-pose statistics + KDE sampling (ref render_utils.py:22-120)."""

    def __init__(self, poses: Sequence[np.ndarray]):
        """poses: list of [3, 4] blender-frame poses from the real train
        split."""
        eulers = np.array([blender_pose_to_blender_euler(p) for p in poses])
        self.eulers = eulers
        self.translations = np.array([p[:, 3] for p in poses])

    def sample_poses(self, num: int, seed: int = 0) -> np.ndarray:
        """KDE-sample (azi, ele, theta) + translation triples
        (ref render_utils.py:110-120). Returns [num, 6]."""
        from scipy import stats
        rng = np.random.RandomState(seed)
        data = np.concatenate([self.eulers, self.translations],
                              axis=1).T       # [6, n]
        # degenerate dimensions (e.g. a fixed-height camera rig) make the
        # KDE covariance singular; jitter them at 1e-6 of the overall scale
        std = data.std(axis=1, keepdims=True)
        scale = max(float(std.max()), 1e-3)
        flat = std[:, 0] < 1e-9 * scale
        if flat.any():
            data = data + rng.randn(*data.shape) * (1e-6 * scale)
        kde = stats.gaussian_kde(data)
        samples = kde.resample(num, seed=rng)
        return samples.T


class PythonRenderer:
    """Blender-free render-set generator using the numpy z-buffer.

    Produces the same artifacts the reference's Blender pipeline feeds into
    LineModImageDB.collect_render_set_info (ref data_utils.py:232-254):
    {k}.jpg, {k}_depth.png, {k}_RT.pkl under renders/{cls}/.
    """

    def __init__(self, cls_name: str, paths: Optional[PathConfig] = None,
                 K: np.ndarray = BLENDER_K, hw: Tuple[int, int] = (480, 640)):
        self.cls_name = cls_name
        self.paths = paths or PathConfig()
        self.K = K
        self.hw = hw
        self.modeldb = LineModModelDB(self.paths)

    def render_pose(self, pose: np.ndarray, rng=None):
        """(rgb uint8, depth f32, mask uint8) for one pose."""
        from pvnet_tpu.data.synthetic import render_synthetic_view
        from pvnet_tpu.data.ply import PlyMesh
        verts, faces = self.modeldb.get_ply_mesh(self.cls_name)
        mesh = PlyMesh(vertices=verts, faces=faces)
        h, w = self.hw
        depth = render_mesh_depth(pose, self.K, verts, faces, h, w)
        mask = (depth > 0).astype(np.uint8)
        rgb, _ = render_synthetic_view(mesh, pose, self.K, h, w, rng)
        return rgb, depth, mask

    def run(self, poses: Sequence[np.ndarray], out_dir: Optional[str] = None
            ) -> str:
        from PIL import Image
        out_dir = out_dir or os.path.join(self.paths.linemod_dir, "renders",
                                          self.cls_name)
        os.makedirs(out_dir, exist_ok=True)
        rng = np.random.RandomState(0)
        for k, pose in enumerate(poses):
            rgb, depth, mask = self.render_pose(pose, rng)
            Image.fromarray(rgb).save(os.path.join(out_dir, f"{k}.jpg"))
            d16 = np.clip(depth * 1000.0, 0, 65535).astype(np.uint16)
            Image.fromarray(d16).save(
                os.path.join(out_dir, f"{k}_depth.png"))
            with open(os.path.join(out_dir, f"{k}_RT.pkl"), "wb") as f:
                pickle.dump({"RT": np.asarray(pose, np.float32), "K": self.K},
                            f)
        return out_dir


class BlenderRenderer:
    """External Blender driver (ref render_utils.py:243-260), gated on the
    binary. Kept for users with the reference's rendering setup."""

    def __init__(self, blender_path: str, backend_script: str):
        self.blender_path = blender_path
        self.backend_script = backend_script

    def available(self) -> bool:
        return os.path.exists(self.blender_path)

    def run(self, obj_path: str, output_dir: str, num_syn: int,
            extra_args: Sequence[str] = ()) -> None:
        if not self.available():
            raise RuntimeError(
                f"Blender binary not found at {self.blender_path}; use "
                f"PythonRenderer for a self-contained render set")
        cmd = [self.blender_path, "--background", "--python",
               self.backend_script, "--", obj_path, output_dir,
               str(num_syn), *extra_args]
        subprocess.run(cmd, check=True)


def generate_occlusion_masks(cls_names: Sequence[str],
                             image_records: Dict[str, Sequence[dict]],
                             paths: Optional[PathConfig] = None,
                             hw: Tuple[int, int] = (480, 640),
                             K: np.ndarray = LINEMOD_K):
    """Per-class occlusion-aware masks by z-buffer compositing of all
    objects per image (ref OcclusionLineModDB.get_mask_of_all_objects +
    get_masks, data_utils.py:788-860).

    Args:
      image_records: class -> list of records with 'RT' per image index
        (all classes must cover the same image list).
    Yields:
      (image_index, {cls: visible-mask uint8 [h, w]}).
    """
    paths = paths or PathConfig()
    modeldb = LineModModelDB(paths)
    h, w = hw
    n_images = min(len(v) for v in image_records.values())
    for idx in range(n_images):
        depths = {}
        for cls in cls_names:
            verts, faces = modeldb.get_ply_mesh(cls)
            depth = render_mesh_depth(image_records[cls][idx]["RT"], K,
                                      verts, faces, h, w)
            depth[depth == 0] = np.inf
            depths[cls] = depth
        stack = np.stack([depths[c] for c in cls_names])   # [c, h, w]
        winner = np.argmin(stack, axis=0)
        visible = np.isfinite(stack.min(axis=0))
        masks = {}
        for ci, cls in enumerate(cls_names):
            masks[cls] = ((winner == ci) & visible).astype(np.uint8)
        yield idx, masks
