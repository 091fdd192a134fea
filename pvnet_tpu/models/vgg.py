"""Legacy VGG16 seg+vertex network (PoseCNN-style), TPU-native.

Covers the reference's VGG family (ref lib/networks/vgg.py,
lib/networks/vgg16_convs.py:21-52). Upstream this path is dead code — it
imports modules absent from the tree (`lib.hough_voting_layer`,
`LineModDatasetSyn`; SURVEY.md §2.2/§2.8) — but the model itself is well
defined, so it is provided here in working form: a VGG16 backbone exposing
the conv4_3 (stride 8) and conv5_3 (stride 16) feature maps, and the
dual-branch segmentation + vertex heads with bilinear fusion.

Where the reference's forward pass wires into the (missing) Hough voting
layers, this framework's `pvnet_tpu.ops.voting` RANSAC layers apply
directly: `VGG16Convs` emits the same (seg, vertex) pair as `PVNet`, so it
drops into `make_pose_pipeline` unchanged.

NHWC throughout; upsampling uses half-pixel (align_corners=False) bilinear
resize, matching the reference's `F.interpolate(mode='bilinear',
align_corners=False)` (ref vgg16_convs.py:43-50).
"""
from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pvnet_tpu.models.resnet import he_fanout_normal

# torchvision cfg['D'] (ref lib/networks/vgg.py:81): channel widths per
# block, 'M' = 2x2 max pool.
VGG16_CFG: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512))


def _resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """NHWC half-pixel bilinear resize (torch align_corners=False)."""
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, out_h, out_w, c), method="linear")


class VGG16Backbone(nn.Module):
    """VGG16-D feature extractor returning (conv4_3, conv5_3).

    conv4_3: [b, h/8, w/8, 512] — reference `features[:23]`
    conv5_3: [b, h/16, w/16, 512] — reference `features[23:30]`
    (ref vgg16_convs.py:26-27).
    """
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = x.astype(self.dtype)
        feats = {}
        for bi, widths in enumerate(VGG16_CFG):
            if bi > 0:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            for ci, width in enumerate(widths):
                x = nn.Conv(width, (3, 3), padding=[(1, 1)] * 2,
                            dtype=self.dtype,
                            kernel_init=he_fanout_normal(),
                            name=f"conv{bi + 1}_{ci + 1}")(x)
                x = nn.relu(x)
            feats[f"conv{bi + 1}"] = x
        return feats["conv4"], feats["conv5"]


class VGG16Convs(nn.Module):
    """Dual-branch seg + vertex FCN on VGG16 (ref vgg16_convs.py:21-52).

    Each head reduces conv4_3 and conv5_3 with 1x1 convs, fuses them by
    upsampled addition at stride 8, then upsamples to full resolution:
      seg branches -> 64 ch (ReLU) -> 2-class logits
      vertex branches -> 128 ch (linear) -> ver_dim channels

    Returns (seg_score, seg_pred, vertex_pred) like the reference:
    logits, softmax probabilities, and the vector field — all [b,h,w,*]
    float32. `as_pvnet_outputs()` adapts to the (seg, ver) pair the rest
    of the framework consumes.
    """
    ver_dim: int = 16
    seg_dim: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False):
        del train  # no BN/dropout in this head (ref uses plain convs)
        b, h, w, _ = x.shape
        conv4_3, conv5_3 = VGG16Backbone(dtype=self.dtype)(x)

        def branch(width: int, relu: bool, name: str):
            b1 = nn.Conv(width, (1, 1), dtype=self.dtype,
                         kernel_init=he_fanout_normal(),
                         name=f"{name}_branch1")(conv4_3)
            b2 = nn.Conv(width, (1, 1), dtype=self.dtype,
                         kernel_init=he_fanout_normal(),
                         name=f"{name}_branch2")(conv5_3)
            if relu:
                b1, b2 = nn.relu(b1), nn.relu(b2)
            fused = b1 + _resize_bilinear(b2, b1.shape[1], b1.shape[2])
            return _resize_bilinear(fused, h, w)

        seg_add = branch(64, relu=True, name="seg")
        seg_score = nn.Conv(self.seg_dim, (1, 1), dtype=self.dtype,
                            kernel_init=he_fanout_normal(),
                            name="seg")(seg_add).astype(jnp.float32)
        seg_pred = jax.nn.softmax(seg_score, axis=-1)

        ver_add = branch(128, relu=False, name="vertex")
        vertex_pred = nn.Conv(self.ver_dim, (1, 1), dtype=self.dtype,
                              kernel_init=he_fanout_normal(),
                              name="vertex")(ver_add).astype(jnp.float32)
        return seg_score, seg_pred, vertex_pred


def vgg16_convs(ver_dim: int = 16, seg_dim: int = 2, **kw) -> VGG16Convs:
    """Factory mirroring the reference ctor (BB8 voting: 8 kps * 2 = 16)."""
    return VGG16Convs(ver_dim=ver_dim, seg_dim=seg_dim, **kw)


def as_pvnet_outputs(outputs) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Adapt VGG16Convs' 3-tuple to the (seg_logits, vertex) pair consumed
    by the voting/eval pipeline (same contract as PVNet.__call__)."""
    seg_score, _, vertex_pred = outputs
    return seg_score, vertex_pred
