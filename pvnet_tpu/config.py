"""Typed configuration for pvnet_tpu.

The reference scatters configuration across three uncoordinated layers: a
global EasyDict built at import time (ref lib/utils/config.py), argparse flags
(ref lib/utils/arg_utils.py) and a JSON training recipe with a nested aug_cfg
block (ref configs/linemod_train.json, lib/datasets/default_linemod_cfg.json).
Here everything collapses into typed dataclasses that remain JSON-compatible
with the reference's ``linemod_train.json`` schema (same field names), so the
reference's recipes load unchanged via :func:`TrainConfig.from_json`.
"""
from __future__ import annotations

import dataclasses
import json
import os
from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

# ---------------------------------------------------------------------------
# Static dataset facts (ref lib/utils/config.py:61-70)
# ---------------------------------------------------------------------------

LINEMOD_K = np.array(
    [[572.41140, 0.0, 325.26110],
     [0.0, 573.57043, 242.04899],
     [0.0, 0.0, 1.0]], dtype=np.float32)

BLENDER_K = np.array(
    [[700.0, 0.0, 320.0],
     [0.0, 700.0, 240.0],
     [0.0, 0.0, 1.0]], dtype=np.float32)

PASCAL_K = np.array(
    [[-3000.0, 0.0, 0.0],
     [0.0, 3000.0, 0.0],
     [0.0, 0.0, 1.0]], dtype=np.float32)

INTRINSIC_MATRICES = {
    "linemod": LINEMOD_K,
    "blender": BLENDER_K,
    "pascal": PASCAL_K,
}

LINEMOD_CLS_NAMES = [
    "ape", "cam", "cat", "duck", "glue", "iron", "phone",
    "benchvise", "can", "driller", "eggbox", "holepuncher", "lamp",
]
OCC_LINEMOD_CLS_NAMES = [
    "ape", "can", "cat", "driller", "duck", "eggbox", "glue", "holepuncher",
]
SYMMETRIC_CLS_NAMES = ["glue", "eggbox"]

# ImageNet normalization used by the input transform
# (ref lib/datasets/linemod_dataset.py:185-195).
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def repo_root() -> str:
    return os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@dataclass
class PathConfig:
    """Filesystem layout (ref lib/utils/config.py:11-37)."""
    data_dir: str = field(default_factory=lambda: os.path.join(repo_root(), "data"))

    @property
    def linemod_dir(self) -> str:
        return os.path.join(self.data_dir, "LINEMOD")

    @property
    def linemod_orig_dir(self) -> str:
        return os.path.join(self.data_dir, "LINEMOD_ORIG")

    @property
    def occlusion_linemod_dir(self) -> str:
        return os.path.join(self.data_dir, "OCCLUSION_LINEMOD")

    @property
    def model_dir(self) -> str:
        return os.path.join(self.data_dir, "model")

    @property
    def record_dir(self) -> str:
        return os.path.join(self.data_dir, "record")


@dataclass
class AugConfig:
    """Augmentation recipe; field names mirror the reference aug_cfg JSON
    (ref configs/linemod_train.json:38-77)."""
    mask: bool = False
    min_mask: float = 0.1
    max_mask: float = 0.4

    rotation: bool = True
    rot_ang_min: float = -30.0
    rot_ang_max: float = 30.0

    crop: bool = True
    use_old: bool = True
    resize_ratio_min: float = 0.8
    resize_ratio_max: float = 1.2

    overlap_ratio: float = 0.8
    resize_hmin: int = 20
    resize_hmax: int = 130
    resize_wmin: int = 20
    resize_wmax: int = 130

    flip: bool = False
    blur: bool = True

    jitter: bool = True
    brightness: float = 0.1
    contrast: float = 0.1
    saturation: float = 0.05
    hue: float = 0.05

    # batch image-size sampling range (ref linemod_dataset.py:306-317)
    wmax: int = 640
    wmin: int = 256
    hmax: int = 480
    hmin: int = 256
    size_int: int = 8

    ignore_fuse_ms_vertex: bool = False
    use_mask_out: bool = False

    @classmethod
    def from_dict(cls, d: dict) -> "AugConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def size_buckets(self) -> List[Tuple[int, int]]:
        """Discrete (h, w) buckets the sampler may draw.

        The reference samples any (h, w) on an 8-px grid per batch
        (ref linemod_dataset.py:314-317); on TPU each distinct shape is a new
        XLA compilation, so the full grid is the bucket set and callers may
        subsample it (see data.pipeline.BucketedSizeSampler).
        """
        hs = list(range(self.hmin, self.hmax + 1, self.size_int))
        ws = list(range(self.wmin, self.wmax + 1, self.size_int))
        return [(h, w) for h in hs for w in ws]


@dataclass
class VoteConfig:
    """Fixed-shape voting envelope.

    The reference uses dynamic foreground counts (torch.nonzero) and a
    data-dependent while loop with a RANSAC confidence stop
    (ref ransac_voting_gpu.py:514-598). The TPU design fixes every shape:
    ``max_num`` foreground pixels (randomly subsampled exactly as the
    reference subsamples above its own cap) and ``hyp_num`` total hypotheses
    generated in one fused pass (>= the reference's worst case
    round_hyp_num * (max_iter+1)).
    """
    vote_num: int = 9               # keypoints (Farthest: 8 FPS + center)
    hyp_num: int = 1024             # total hypotheses in one pass
    max_num: int = 1024             # fixed foreground pixel budget (TN)
    inlier_thresh: float = 0.99     # eval path (ref train_linemod.py:104-106)
    min_num: int = 5
    confidence: float = 0.99        # kept for parity bookkeeping


@dataclass
class TrainConfig:
    """Training recipe, JSON-compatible with ref configs/linemod_train.json."""
    model_name: str = "linemod_train"
    network: str = "resnet18_8s"
    # Model head emission layout: 'NHWC' or 'NCHW' (channel-major).
    # Checkpoints interchange (same param tree, models/pvnet.py
    # _HeadConvCMajor). NCHW runs the training loss channel-major —
    # full-res [b,c,h,w] keeps w as the dense minor dim where NHWC's
    # c=18/c=2 tensors are lane-padded 7x/64x in HBM (train/loss.py).
    head_layout: str = "NHWC"
    # Model image-input layout: 'NCHW' makes the on-device augmentation
    # emit channel-major [b, 3, h, w] and the stem conv read it directly
    # (models/resnet.Conv cm_input) — no 42x-lane-padded [b, h, w, 3]
    # materialization between aug and conv1. Only affects the device-aug
    # training step; eval/inference still ship NHWC (the model dispatches
    # on shape). Requires device_aug/device_data.
    input_layout: str = "NHWC"
    # Backbone stages to run int8 PTQ at inference (ops/quant_conv.py);
    # e.g. [2, 3] = layer3+layer4. Training always runs float.
    quant_stages: tuple = ()
    # int8 the decoder fc/8s convs at inference (models/pvnet.py
    # quant_decoder) and the packed-tail stage convs
    # (ops/packed_tail.run_packed_stage(quant=True))
    quant_decoder: bool = False
    quant_tail: bool = False
    # activation-scale scheme for the int8 convs: 'dynamic' (per-image
    # absmax in-graph) or 'static' (calibrated scalar per conv — measured
    # FASTER e2e, 769.3 vs 737.5 poses/s b128; needs a calibration pass,
    # see train/loop.TrainLoop.calibrate_quant / ops/quant_conv.calibrate)
    quant_mode: str = "dynamic"

    lr: float = 1e-3
    lr_decay_rate: float = 0.5
    lr_decay_epoch: int = 20
    lr_min: float = 1e-5            # floor (ref net_utils.py:272-281)
    train_batch_size: int = 32
    test_batch_size: int = 1
    motion_model: bool = False

    resume: bool = True
    epoch_num: int = 200

    use_real_train: bool = True
    use_fuse: bool = True

    loss_rec_step: int = 80
    img_rec_step: int = 160

    eval_epoch: bool = False
    eval_inter: int = 5
    eval_epoch_begin: int = 80
    val_inter: int = 1          # run the val-loss pass every N epochs
                                # (1 = reference behavior, ref
                                # train_linemod.py:328-333; raise when the
                                # val pass dominates wall time)

    vote_type: str = "Farthest"
    vertex_loss_ratio: float = 1.0

    aug_cfg: AugConfig = field(default_factory=AugConfig)

    # TPU-specific knobs (absent in the reference)
    seed: int = 0
    mesh_shape: Optional[Tuple[int, ...]] = None   # None -> all devices on 'data'
    bf16: bool = False                             # compute FCN in bfloat16
    checkpoint_keep: int = 10
    device_aug: bool = False    # run augmentation inside the jitted step
                                # (data.augment_device) instead of on host
    device_data: bool = False   # keep the ENTIRE training set resident in
                                # HBM (uint8) and gather minibatches by
                                # index on device — no per-step host
                                # transfers (requires device_aug and
                                # uniform image sizes)
    cache_images: bool = False  # keep decoded rgb/mask in host RAM
                                # (~0.9 MB/img at 480x640; single-core
                                # JPEG decode otherwise dominates the host
                                # pipeline)

    # Keys the source recipe JSON pinned (set by from_dict; class-level
    # non-field default so bare TrainConfig() reads as "nothing pinned"
    # and dataclasses.asdict never serializes it).
    recipe_keys = frozenset()

    @classmethod
    def from_json(cls, path: str) -> "TrainConfig":
        with open(path, "r") as f:
            d = json.load(f)
        return cls.from_dict(d)

    @classmethod
    def from_dict(cls, d: dict) -> "TrainConfig":
        d = dict(d)
        aug = d.pop("aug_cfg", None)
        names = {f.name for f in dataclasses.fields(cls)}
        kwargs = {k: v for k, v in d.items() if k in names}
        if aug is not None:
            kwargs["aug_cfg"] = AugConfig.from_dict(aug)
        cfg = cls(**kwargs)
        # Which keys the recipe actually pinned — lets CLI auto-selection
        # (tools/train.py layout defaults) distinguish "recipe chose this"
        # from "dataclass default". Not a dataclass field: to_dict/asdict
        # ignore it, and a bare TrainConfig() has the empty set.
        cfg.recipe_keys = frozenset(d) | ({"aug_cfg"} if aug is not None
                                          else frozenset())
        return cfg

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)


# vote_type -> number of voted keypoints (ref tools/train_linemod.py:38-59)
VOTE_TYPE_TO_NUM = {
    "BB8": 8,
    "BB8C": 9,
    "BB8S": 9,
    "Farthest": 9,
    "Farthest4": 5,
    "Farthest12": 13,
    "Farthest16": 17,
    "Farthest20": 21,
}
