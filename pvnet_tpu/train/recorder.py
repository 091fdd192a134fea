"""Metrics recording: console + append-only JSONL + optional TensorBoard.

The reference's Recorder wraps tensorboardX with scalar groups and colorized
segmentation / vector-field image grids (ref lib/utils/net_utils.py:152-239).
Here: scalars always go to console and a JSONL log (machine-readable
replacement for the append-only text log); TensorBoard is an optional sink
via torch.utils.tensorboard when importable; image summaries reuse the
colorize helpers from utils.viz.
"""
from __future__ import annotations

import json
import os
import time
from collections import OrderedDict
from typing import Dict, Optional

import numpy as np


class AverageMeter:
    """Running average (ref net_utils.py:133-149)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0
        self.avg = 0.0

    def update(self, val, n: int = 1):
        val = float(val)
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count


class Recorder:
    """Scalar/image sink (ref net_utils.py:152-239)."""

    def __init__(self, rec_dir: Optional[str] = None,
                 use_tensorboard: bool = True):
        self.rec_dir = rec_dir
        self.jsonl_path = None
        self.writer = None
        if rec_dir is not None:
            os.makedirs(rec_dir, exist_ok=True)
            self.jsonl_path = os.path.join(rec_dir, "log.jsonl")
            if use_tensorboard:
                try:
                    from torch.utils.tensorboard import SummaryWriter
                    self.writer = SummaryWriter(log_dir=rec_dir)
                except Exception:
                    self.writer = None

    def rec_loss_batch(self, losses: Dict[str, float], step: int, epoch: int,
                       prefix: str = "train") -> None:
        """Scalar group (ref net_utils.py:185-200)."""
        msg = f"{prefix} epoch {epoch} step {step}"
        for k, v in losses.items():
            msg += f" {k.split('/')[-1]} {float(v):.8f}"
        print(msg, flush=True)
        if self.jsonl_path:
            rec = OrderedDict(ts=time.time(), prefix=prefix, epoch=epoch,
                              step=step)
            rec.update({k: float(v) for k, v in losses.items()})
            with open(self.jsonl_path, "a") as f:
                f.write(json.dumps(rec) + "\n")
        if self.writer is not None:
            for k, v in losses.items():
                self.writer.add_scalar(k, float(v), step)

    def rec_segmentation(self, seg_pred: np.ndarray, step: int,
                         name: str = "train/image/seg") -> None:
        """Colorized argmax segmentation grid (ref net_utils.py:212-227)."""
        if self.writer is None:
            return
        from pvnet_tpu.utils.viz import colorize_segmentation, make_grid
        imgs = colorize_segmentation(np.argmax(seg_pred, axis=-1))
        grid = make_grid(imgs, nrow=min(5, imgs.shape[0]))
        self.writer.add_image(name, grid.transpose(2, 0, 1), step)

    def rec_vertex(self, ver_pred: np.ndarray, ver_weights: np.ndarray,
                   step: int, name: str = "train/image/ver") -> None:
        """Colormapped first vector-field channel grid
        (ref net_utils.py:229-239)."""
        if self.writer is None:
            return
        from pvnet_tpu.utils.viz import colorize_vertex_field, make_grid
        imgs = colorize_vertex_field(ver_pred, ver_weights)
        grid = make_grid(imgs, nrow=min(4, imgs.shape[0]))
        self.writer.add_image(name, grid.transpose(2, 0, 1), step)

    def close(self):
        if self.writer is not None:
            self.writer.close()
