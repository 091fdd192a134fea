"""Single-channel detector heads (ref model_repository.py:302-331).

Experimental heatmap-detector variants the reference keeps alongside the
production FCN: a stride-8 1-channel head on the full dilated backbone
(Resnet18_8s_detector) and a truncated-trunk variant that stops at the
stride-8 features (Resnet18_8s_detector_v2).
"""
from __future__ import annotations

from functools import partial
from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from pvnet_tpu.models.resnet import (BasicBlock, ResNetBackbone,
                                     he_fanout_normal)


class Detector(nn.Module):
    """Stride-8 single-channel detection head on the full backbone
    (ref :302-315). Returns [b, h/8, w/8, 1] logits."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        backbone = ResNetBackbone(block=BasicBlock,
                                  stage_sizes=(2, 2, 2, 2),
                                  output_stride=8, dtype=self.dtype)
        _, _, _, _, x32s = backbone(x.astype(self.dtype), train=train)
        out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      kernel_init=he_fanout_normal())(x32s)
        return out.astype(jnp.float32)


class DetectorV2(nn.Module):
    """Truncated-trunk detector: conv1..layer2 then a 1-channel head
    (ref :318-331). Returns [b, h/8, w/8, 1] logits."""
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = x.astype(self.dtype)
        conv = partial(nn.Conv, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                 use_bias=False, kernel_init=he_fanout_normal())(x)
        x = nn.relu(norm()(x))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)
        for filters, stride, n in ((64, 1, 2), (128, 2, 2)):
            for i in range(n):
                x = BasicBlock(filters, strides=stride if i == 0 else 1,
                               conv=conv, norm=norm)(x)
        out = nn.Conv(1, (3, 3), padding=[(1, 1)] * 2, dtype=self.dtype,
                      kernel_init=he_fanout_normal())(x)
        return out.astype(jnp.float32)
