"""Dataset + sampling + host input pipeline.

Re-implements the reference's torch Dataset / batch sampler stack
(ref lib/datasets/linemod_dataset.py:174-336) without torch:

- :class:`VotingType` — vote-type enum and 2D/3D target-point selection
  (ref :83-169).
- :class:`PoseDataset` — per-sample load + augment + normalize
  (ref LineModDatasetRealAug :174-290). Vertex targets are computed
  on-device by default (see data.vertex), so samples ship only
  (rgb, mask, hcoords[, K]).
- :class:`ImageSizeBatchSampler` — one random (h, w) per batch on an 8-px
  grid (ref :293-336), optionally restricted to a small bucket set to bound
  XLA recompilation.
- :class:`Prefetcher` — threaded look-ahead batching replacing the
  reference's 12 DataLoader worker processes (ref train_linemod.py:325).
"""
from __future__ import annotations

import queue
import threading
import time
from dataclasses import dataclass
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from pvnet_tpu.config import (AugConfig, IMAGENET_MEAN, IMAGENET_STD,
                              LINEMOD_CLS_NAMES)
from pvnet_tpu.data import augment as A
from pvnet_tpu.data.linemod import (LineModModelDB, read_mask_np,
                                    read_rgb_np)
from pvnet_tpu.data.vertex import compute_vertex_targets_np


class VotingType:
    """Vote-type registry (ref linemod_dataset.py:83-169)."""
    BB8 = "BB8"
    BB8C = "BB8C"
    BB8S = "BB8S"
    Farthest = "Farthest"
    Farthest4 = "Farthest4"
    Farthest12 = "Farthest12"
    Farthest16 = "Farthest16"
    Farthest20 = "Farthest20"

    _FARTHEST_KEY = {
        Farthest: "farthest", Farthest4: "farthest4",
        Farthest12: "farthest12", Farthest16: "farthest16",
        Farthest20: "farthest20",
    }
    _FARTHEST_NUM = {
        Farthest: 8, Farthest4: 4, Farthest12: 12, Farthest16: 16,
        Farthest20: 20,
    }

    @classmethod
    def vote_num(cls, vote_type: str) -> int:
        """Keypoint count incl. center (ref train_linemod.py:38-59)."""
        if vote_type == cls.BB8:
            return 8
        if vote_type in (cls.BB8C, cls.BB8S):
            return 9
        return cls._FARTHEST_NUM[vote_type] + 1

    @classmethod
    def get_data_pts_2d(cls, vote_type: str, data: dict) -> np.ndarray:
        """Homogeneous 2D target keypoints from an image record
        (ref :94-140)."""
        if vote_type == cls.BB8:
            cor = data["corners"].copy()
            return np.concatenate(
                [cor, np.ones([8, 1], np.float32)], 1).astype(np.float32)
        if vote_type == cls.BB8C:
            pts = np.concatenate([data["corners"].copy(),
                                  data["center"].copy()], 0)
        elif vote_type == cls.BB8S:
            pts = np.concatenate([data["small_bbox"].copy(),
                                  data["center"].copy()], 0)
        else:
            far = data[cls._FARTHEST_KEY[vote_type]].copy()
            pts = np.concatenate([far, data["center"].copy()], 0)
        return np.concatenate(
            [pts, np.ones([pts.shape[0], 1], np.float32)],
            1).astype(np.float32)

    @classmethod
    def get_pts_3d(cls, vote_type: str, class_type: str,
                   modeldb: LineModModelDB) -> np.ndarray:
        """Canonical 3D keypoints for PnP (ref :142-169)."""
        if vote_type == cls.BB8:
            return modeldb.get_corners_3d(class_type)
        if vote_type == cls.BB8C:
            base = modeldb.get_corners_3d(class_type)
        elif vote_type == cls.BB8S:
            base = modeldb.get_small_bbox(class_type)
        else:
            base = modeldb.get_farthest_3d(class_type,
                                           cls._FARTHEST_NUM[vote_type])
        return np.concatenate(
            [base, modeldb.get_centers_3d(class_type)[None, :]], 0)


@dataclass
class Sample:
    """One prepared training/eval sample (host side)."""
    rgb: np.ndarray           # [h, w, 3] float32, ImageNet-normalized
    mask: np.ndarray          # [h, w] int32
    hcoords: np.ndarray       # [k, 3] float32 homogeneous 2D keypoints
    pose: np.ndarray          # [3, 4] float32
    K: Optional[np.ndarray] = None      # [3, 3] per-image intrinsics
    vertex: Optional[np.ndarray] = None  # [h, w, 2k] if computed on host
    ignore_vertex: bool = False          # zero the vertex loss weight
                                         # (fuse set, ref :242)
    out_hw: Optional[Tuple[int, int]] = None  # requested target size
                                              # (raw/device-aug mode)


class PoseDataset:
    """Load + augment one record (ref LineModDatasetRealAug :174-290)."""

    def __init__(self, imagedb: Sequence[dict], data_prefix: str,
                 vote_type: str = VotingType.Farthest,
                 augment: bool = False,
                 aug_cfg: Optional[AugConfig] = None,
                 use_intrinsic: bool = False, use_motion: bool = False,
                 host_vertex: bool = False, seed: int = 0,
                 fast_aug: bool = True, raw: bool = False,
                 cache_images: bool = False):
        self.imagedb = list(imagedb)
        self.data_prefix = data_prefix
        self.vote_type = vote_type
        self.augment = augment
        self.cfg = aug_cfg or AugConfig()
        self.use_intrinsic = use_intrinsic
        self.use_motion = use_motion
        self.host_vertex = host_vertex
        self.fast_aug = fast_aug
        # raw mode: no host augmentation/normalization — full-frame 0..255
        # pixels for the on-device pipeline (data.augment_device)
        self.raw = raw
        # in-memory decoded rgb/mask cache: JPEG decode is a large share of
        # the single-core host pipeline (the reference amortizes it over 12
        # worker processes, ref train_linemod.py:325 — this host has one
        # core). ~0.9 MB/image at 480x640; enable for datasets that fit.
        self.cache_images = cache_images
        self._cache: dict = {}
        self.rng = np.random.RandomState(seed)

    def __len__(self) -> int:
        return len(self.imagedb)

    def __getitem__(self, index_hw: Tuple[int, int, int]) -> Sample:
        """index_hw = (index, target_h, target_w), like the reference's
        tuple indices from the batch sampler (ref :200-201)."""
        import os
        index, height, width = index_hw
        rec = self.imagedb[index]
        if self.cache_images and index in self._cache:
            rgb, mask = self._cache[index]
            rgb = rgb.copy()
        else:
            rgb = read_rgb_np(os.path.join(self.data_prefix, rec["rgb_pth"]))
            mask = read_mask_np(os.path.join(self.data_prefix,
                                             rec["dpt_pth"]))
            if self.cache_images:
                self._cache[index] = (rgb.copy(), mask)
        pose = rec["RT"].copy()

        if rec["rnd_typ"] == "real" and mask.ndim == 3:
            mask = np.asarray(np.sum(mask, 2) > 0, np.int32)
        if rec["rnd_typ"] == "fuse":
            mask = np.asarray(
                mask == (LINEMOD_CLS_NAMES.index(rec["cls_typ"]) + 1),
                np.int32)
        mask = mask.astype(np.int32)
        if mask.max() > 1:
            mask = (mask > 0).astype(np.int32)

        hcoords = VotingType.get_data_pts_2d(self.vote_type, rec)
        K = rec["K"].astype(np.float32) if self.use_intrinsic else None

        if self.raw:
            ignore = (rec["rnd_typ"] == "fuse"
                      and self.cfg.ignore_fuse_ms_vertex)
            # uint8 pixels / masks: the host->device link is the scarce
            # resource in this mode; the jitted step casts on device
            return Sample(rgb=np.ascontiguousarray(rgb, np.uint8),
                          mask=np.ascontiguousarray(mask, np.uint8),
                          hcoords=hcoords.astype(np.float32),
                          pose=pose.astype(np.float32), K=K, vertex=None,
                          ignore_vertex=ignore, out_hw=(height, width))

        if self.augment:
            rgb, mask, hcoords = self._augmentation(rgb, mask, hcoords,
                                                    height, width)

        if self.augment:
            if self.cfg.blur and self.rng.random() < 0.5:
                rgb = A.blur_image(rgb, int(self.rng.choice([3, 5, 7, 9])))
            if self.cfg.jitter:
                rgb = A.color_jitter(rgb, self.cfg.brightness,
                                     self.cfg.contrast, self.cfg.saturation,
                                     self.cfg.hue, self.rng)
        rgb = rgb.astype(np.float32) / 255.0
        rgb = (rgb - IMAGENET_MEAN) / IMAGENET_STD
        if self.augment and self.cfg.use_mask_out \
                and self.rng.random() < 0.1:
            rgb = rgb * mask[:, :, None].astype(np.float32)

        vertex = None
        if self.host_vertex:
            vertex = compute_vertex_targets_np(mask, hcoords,
                                               self.use_motion)
        ignore = (rec["rnd_typ"] == "fuse"
                  and self.cfg.ignore_fuse_ms_vertex)
        return Sample(rgb=rgb, mask=np.ascontiguousarray(mask),
                      hcoords=hcoords.astype(np.float32),
                      pose=pose.astype(np.float32), K=K, vertex=vertex,
                      ignore_vertex=ignore)

    def _augmentation(self, img, mask, hcoords, height, width):
        """(ref :254-290)"""
        cfg, rng = self.cfg, self.rng
        foreground = int(np.sum(mask))
        if cfg.mask and rng.random() < 0.5 and foreground > 0:
            img, mask = A.mask_out_instance(img, mask, cfg.min_mask,
                                            cfg.max_mask, rng)
        if foreground > 0:
            if (self.fast_aug and cfg.rotation and cfg.crop
                    and cfg.use_old and np.sum(mask) > 0):
                # single-warp fused path (same affine; see augment.py)
                img, mask, hcoords = A.fused_rotate_crop_resize(
                    img, mask, hcoords, height, width, cfg.rot_ang_min,
                    cfg.rot_ang_max, cfg.overlap_ratio,
                    cfg.resize_ratio_min, cfg.resize_ratio_max, rng)
                if cfg.flip and rng.random() < 0.5:
                    img, mask, hcoords = A.flip(img, mask, hcoords)
                return img, mask, hcoords
            if cfg.rotation:
                img, mask, hcoords = A.rotate_instance(
                    img, mask, hcoords, cfg.rot_ang_min, cfg.rot_ang_max,
                    rng)
            if cfg.crop:
                if cfg.use_old:
                    img, mask, hcoords = A.crop_resize_instance_v1(
                        img, mask, hcoords, height, width,
                        cfg.overlap_ratio, cfg.resize_ratio_min,
                        cfg.resize_ratio_max, rng)
                else:
                    img, mask, hcoords = A.crop_resize_instance_v2(
                        img, mask, hcoords, height, width,
                        cfg.overlap_ratio, cfg.resize_hmin, cfg.resize_hmax,
                        cfg.resize_wmin, cfg.resize_wmax, rng)
        else:
            img, mask = A.crop_or_padding_to_fixed_size(img, mask, height,
                                                        width, rng)
        if cfg.flip and rng.random() < 0.5:
            img, mask, hcoords = A.flip(img, mask, hcoords)
        return img, mask, hcoords


class ImageSizeBatchSampler:
    """One random (h, w) per batch (ref linemod_dataset.py:293-336).

    On TPU every distinct (h, w) is a separate XLA compilation; pass
    ``buckets`` (a small list of (h, w)) to bound the compile count while
    keeping multi-resolution training. ``buckets=None`` reproduces the
    reference's full 8-px grid.
    """

    def __init__(self, indices: Sequence[int], batch_size: int,
                 drop_last: bool = False,
                 aug_cfg: Optional[AugConfig] = None,
                 buckets: Optional[List[Tuple[int, int]]] = None,
                 shuffle: bool = True, seed: int = 0):
        self.indices = list(indices)
        self.batch_size = batch_size
        self.drop_last = drop_last
        cfg = aug_cfg or AugConfig()
        self.cfg = cfg
        self.buckets = buckets
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.hint = (cfg.hmax - cfg.hmin) // cfg.size_int + 1
        self.wint = (cfg.wmax - cfg.wmin) // cfg.size_int + 1

    def generate_height_width(self) -> Tuple[int, int]:
        if self.buckets is not None:
            return self.buckets[self.rng.randint(len(self.buckets))]
        hi = self.rng.randint(0, self.hint)
        wi = self.rng.randint(0, self.wint)
        return (self.cfg.hmin + hi * self.cfg.size_int,
                self.cfg.wmin + wi * self.cfg.size_int)

    def __iter__(self) -> Iterator[List[Tuple[int, int, int]]]:
        order = list(self.indices)
        if self.shuffle:
            self.rng.shuffle(order)
        batch = []
        h, w = self.generate_height_width()
        for idx in order:
            batch.append((idx, h, w))
            if len(batch) == self.batch_size:
                yield batch
                batch = []
                h, w = self.generate_height_width()
        if batch and not self.drop_last:
            yield batch

    def __len__(self) -> int:
        n = len(self.indices)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


def collate(samples: List[Sample]) -> Dict[str, np.ndarray]:
    """Stack samples into a batch dict of numpy arrays.

    Raw (device-aug) samples stay uint8 and skip vertex_weights — the
    jitted step casts / recomputes them post-warp on device, and the
    smaller payload matters on a narrow host->device link."""
    raw = samples[0].out_hw is not None
    imgs = np.stack([s.rgb for s in samples])
    batch = {
        "image": imgs if raw else imgs.astype(np.float32),
        "mask": np.stack([s.mask for s in samples]).astype(
            np.uint8 if raw else np.int32),
        "hcoords": np.stack([s.hcoords for s in samples]),
        "pose": np.stack([s.pose for s in samples]),
    }
    ignore = np.array([s.ignore_vertex for s in samples], np.float32)
    if raw:
        batch["out_hw"] = np.asarray(samples[0].out_hw, np.int32)
        batch["ignore"] = ignore
    else:
        batch["vertex_weights"] = ((batch["mask"] > 0)[..., None]
                                   * (1.0 - ignore)[:, None, None, None]
                                   ).astype(np.float32)
    if samples[0].K is not None:
        batch["K"] = np.stack([s.K for s in samples])
    if samples[0].vertex is not None:
        batch["vertex"] = np.stack([s.vertex for s in samples])
    return batch


class Prefetcher:
    """Threaded look-ahead over (dataset, batch sampler) producing collated
    numpy batches; replaces the reference's 12 worker processes."""

    def __init__(self, dataset: PoseDataset,
                 batch_sampler: ImageSizeBatchSampler,
                 num_threads: int = 4, prefetch: int = 4):
        self.dataset = dataset
        self.batch_sampler = batch_sampler
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch

    def __len__(self):
        return len(self.batch_sampler)

    def __iter__(self):
        batch_queue: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        index_queue: "queue.Queue" = queue.Queue()
        batches = list(self.batch_sampler)
        for i, b in enumerate(batches):
            index_queue.put((i, b))
        results: Dict[int, dict] = {}
        lock = threading.Lock()
        stop = threading.Event()

        def put(item):
            # bounded put that aborts when the consumer has gone away —
            # a plain blocking put would leave workers pinned on a full
            # queue forever if the caller breaks out of the generator
            # early (e.g. calibrate_quant takes 2 batches of a full
            # epoch), leaking threads + decoded batches per call
            while not stop.is_set():
                try:
                    batch_queue.put(item, timeout=0.1)
                    return
                except queue.Full:
                    continue

        def worker():
            while not stop.is_set():
                try:
                    i, spec = index_queue.get_nowait()
                except queue.Empty:
                    return
                try:
                    samples = [self.dataset[s] for s in spec]
                    put((i, collate(samples)))
                except BaseException as e:   # propagate, never deadlock
                    put((i, e))

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(self.num_threads)]
        for t in threads:
            t.start()

        try:
            next_i = 0
            received = 0
            while received < len(batches):
                i, batch = batch_queue.get()
                if isinstance(batch, BaseException):
                    raise RuntimeError(
                        f"prefetch worker failed on batch {i}") from batch
                received += 1
                with lock:
                    results[i] = batch
                while next_i in results:
                    yield results.pop(next_i)
                    next_i += 1
        finally:
            # runs on normal exhaustion, exceptions, AND generator close
            # (consumer break / GC) — release the workers and their
            # queued batches
            stop.set()
            while any(t.is_alive() for t in threads):
                try:
                    batch_queue.get_nowait()
                except queue.Empty:
                    time.sleep(0.01)
            results.clear()
