"""Dilated ResNet backbones in Flax (NHWC, TPU-native).

Re-implements the reference's torchvision-derived dilated ResNet
(ref lib/networks/resnet.py) with the same output-stride machinery: strides
convert to dilations once the requested output stride is reached
(ref resnet.py:167-198), 3x3 convs pad by their dilation
(ref resnet.py:21-38), and the forward pass returns every intermediate
feature map for decoder skip connections (ref resnet.py:200-220).

Differences from the reference are deliberate TPU choices, not omissions:
- NHWC layout (TPU conv layout) instead of NCHW.
- He fan-out normal init for convs, matching the reference's
  ``normal_(0, sqrt(2/n))`` with n = k*k*out_channels (ref resnet.py:159-162).
- BatchNorm via flax.linen.BatchNorm (eps 1e-5, momentum 0.9 == torch 0.1),
  with batch statistics computed over the *global* (sharded) batch under
  pjit — a strict upgrade over DataParallel's per-replica stats.
- Optional bfloat16 compute with float32 params/statistics.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any


def he_fanout_normal():
    return nn.initializers.variance_scaling(2.0, "fan_out",
                                            "truncated_normal")


def space_to_batch(x: jnp.ndarray, d: int) -> jnp.ndarray:
    """[b, h, w, c] -> [b*d*d, h/d, w/d, c] interleaved subgrids.

    A stride-1, pad=d, dilation-d 3x3 conv is exactly a dense pad-1 3x3
    conv run independently on each of the d*d subgrids (taps at +-d stay
    on one subgrid; subgrid zero-padding coincides with the image-edge
    zero-padding). Dilated convs lower ~10% slower than dense ones on
    this backend (tools/bench_dilated.py), and everything position-
    independent (BN, relu, residual adds, 1x1 convs) commutes with the
    regrouping, so whole dilated stages run in this form."""
    b, h, w, c = x.shape
    xs = x.reshape(b, h // d, d, w // d, d, c).transpose(0, 2, 4, 1, 3, 5)
    return xs.reshape(b * d * d, h // d, w // d, c)


def batch_to_space(x: jnp.ndarray, d: int, batch: int) -> jnp.ndarray:
    """Inverse of space_to_batch."""
    _, hs, ws, c = x.shape
    xs = x.reshape(batch, d, d, hs, ws, c).transpose(0, 3, 1, 4, 2, 5)
    return xs.reshape(batch, hs * d, ws * d, c)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[b, h, w, c] -> [b, h/2, w/2, 4c], packed channel (a*2+b)*c + ch
    for row phase a, column phase b."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // 2, 2, w // 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // 2, w // 2, 4 * c)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of space_to_depth2."""
    b, h2, w2, c4 = x.shape
    c = c4 // 4
    x = x.reshape(b, h2, w2, 2, 2, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, 2 * h2, 2 * w2, c)


def fold_conv7_to_packed4(w7):
    """Fold a 7x7/stride-2/pad-3 conv kernel [7, 7, cin, cout] into the
    equivalent 4x4/stride-1 kernel [4, 4, 4*cin, cout] over the
    space_to_depth2-packed input (padding [(2, 1), (2, 1)]).

    Output pixel (oy, ox) of the stride-2 conv reads input rows
    2oy + dy - 3, dy in [0, 7); on the packed lattice that row is cell
    oy + ky - 2 phase a with dy = 2ky + a - 1 — so each full-res tap has
    exactly one packed slot and the two kernels compute the same sums
    (the packed form carries 2 extra zero taps per axis). Enables the
    stem on a lane-friendly 12-channel input instead of the 3-channel
    image XLA runs at ~1/3 speed (tools/bench_packed_front.py:
    8.6 -> 3.3 ms at b16 480x640)."""
    import numpy as np
    w7 = np.asarray(w7)
    kh, kw, cin, cout = w7.shape
    assert (kh, kw) == (7, 7), w7.shape
    w4 = np.zeros((4, 4, 4 * cin, cout), w7.dtype)
    for ky in range(4):
        for a in range(2):
            dy = 2 * ky + a - 1
            if not 0 <= dy < 7:
                continue
            for kx in range(4):
                for bb in range(2):
                    dx = 2 * kx + bb - 1
                    if not 0 <= dx < 7:
                        continue
                    ch = (a * 2 + bb) * cin
                    w4[ky, kx, ch:ch + cin] = w7[dy, dx]
    return w4


def fold_stem_params(tree):
    """Map a conv7-stem variables/params pytree onto the packed4-stem
    model: every [7, 7, 3, cout] kernel (only the stem conv has that
    shape) is folded via fold_conv7_to_packed4; everything else is
    shared unchanged. Use to load conv7-trained checkpoints (or
    ImageNet-converted backbones) into stem='packed4' models."""
    import flax
    flat = flax.traverse_util.flatten_dict(tree)
    out = {}
    for k, leaf in flat.items():
        if (k[-1] == "kernel" and hasattr(leaf, "shape")
                and leaf.shape[:3] == (7, 7, 3)):
            leaf = jnp.asarray(fold_conv7_to_packed4(leaf))
        out[k] = leaf
    return flax.traverse_util.unflatten_dict(out)


class Conv(nn.Conv):
    """``nn.Conv`` that can read a channel-major [b, c, h, w] input while
    still emitting the usual NHWC output (one ``lax.conv_general_dilated``
    with ("NCHW", "HWIO", "NHWC") dimension numbers — XLA lowers the
    layout change into the conv itself instead of a separate relayout).

    Why: a [b, h, w, 3] f32 image is lane-padded 3->128 in HBM (~42x), so
    *materializing* one inside a jitted program (e.g. the on-device
    augmentation output feeding conv1) costs a ~2.5 GB relayout write per
    16-image 480x640 batch at the measured ~20-30 GB/s relayout speed
    (CLAUDE.md layout rules). Keeping the image channel-major end-to-end
    (augment_batch(out_layout='NCHW') -> this stem) never materializes a
    c=3-minor tensor at all.

    ``cm_split=True`` takes a *pair* (x_nhwc, x_cm) and computes the
    concat-conv ``conv(concat(x_nhwc, to_nhwc(x_cm)))`` exactly as the sum
    of two convs on the kernel's channel slices — used by the decoder raw
    stage, whose input is decoder features ++ rgb.

    The class is deliberately named ``Conv`` so Flax's name-based
    submodule auto-numbering produces the same param paths as ``nn.Conv``
    (the ops/quant_conv.Conv trick) — checkpoints interchange.
    """
    cm_input: bool = False
    cm_split: bool = False

    @nn.compact
    def __call__(self, x):
        if not (self.cm_input or self.cm_split):
            return super().__call__(x)
        assert not self.use_bias, "cm conv: bias unsupported"
        assert self.kernel_dilation in (None, 1), \
            "cm conv: kernel_dilation unsupported"
        assert self.input_dilation in (None, 1), \
            "cm conv: input_dilation unsupported"
        assert self.feature_group_count == 1, "cm conv: groups == 1 only"
        assert self.mask is None, "cm conv: kernel masks unsupported"
        from jax import lax
        ksz = tuple(self.kernel_size)
        strides = self.strides if self.strides is not None else 1
        if isinstance(strides, int):
            strides = (strides,) * len(ksz)
        padding = self.padding
        if not isinstance(padding, str):
            padding = [tuple(p) for p in padding]
        if self.cm_split:
            xh, xc = x
            c1, c2 = xh.shape[-1], xc.shape[1]
            kernel = self.param("kernel", self.kernel_init,
                                ksz + (c1 + c2, self.features),
                                self.param_dtype)
            y = lax.conv_general_dilated(
                xh.astype(self.dtype), kernel[:, :, :c1].astype(self.dtype),
                window_strides=strides, padding=padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=self.precision)
            y = y + lax.conv_general_dilated(
                xc.astype(self.dtype), kernel[:, :, c1:].astype(self.dtype),
                window_strides=strides, padding=padding,
                dimension_numbers=("NCHW", "HWIO", "NHWC"),
                precision=self.precision)
            return y
        cin = x.shape[1]
        kernel = self.param("kernel", self.kernel_init,
                            ksz + (cin, self.features), self.param_dtype)
        return lax.conv_general_dilated(
            x.astype(self.dtype), kernel.astype(self.dtype),
            window_strides=strides, padding=padding,
            dimension_numbers=("NCHW", "HWIO", "NHWC"),
            precision=self.precision)


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (ref resnet.py:41-70)."""
    filters: int
    strides: int = 1
    dilation: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 1

    @nn.compact
    def __call__(self, x):
        residual = x
        pad = self.dilation
        y = self.conv(self.filters, (3, 3), strides=(self.strides,) * 2,
                      padding=[(pad, pad)] * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      kernel_init=he_fanout_normal())(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), padding=[(pad, pad)] * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      kernel_init=he_fanout_normal())(y)
        y = self.norm()(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters, (1, 1),
                                 strides=(self.strides,) * 2, use_bias=False,
                                 kernel_init=he_fanout_normal())(residual)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck (ref resnet.py:73-113)."""
    filters: int
    strides: int = 1
    dilation: int = 1
    conv: ModuleDef = nn.Conv
    norm: ModuleDef = nn.BatchNorm
    expansion: int = 4

    @nn.compact
    def __call__(self, x):
        residual = x
        pad = self.dilation
        y = self.conv(self.filters, (1, 1), use_bias=False,
                      kernel_init=he_fanout_normal())(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters, (3, 3), strides=(self.strides,) * 2,
                      padding=[(pad, pad)] * 2,
                      kernel_dilation=(self.dilation,) * 2, use_bias=False,
                      kernel_init=he_fanout_normal())(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = self.conv(self.filters * 4, (1, 1), use_bias=False,
                      kernel_init=he_fanout_normal())(y)
        y = self.norm()(y)

        if residual.shape != y.shape:
            residual = self.conv(self.filters * 4, (1, 1),
                                 strides=(self.strides,) * 2, use_bias=False,
                                 kernel_init=he_fanout_normal())(residual)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


class ResNetBackbone(nn.Module):
    """Dilated ResNet trunk returning all skip features.

    __call__(x) -> (x2s, x4s, x8s, x16s, x32s): feature maps at strides
    2/4/8/8/8 for output_stride=8 (ref resnet.py:200-220; the reference's
    xfc head lives in the PVNet decoder here).
    """
    block: ModuleDef = BasicBlock
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    output_stride: int = 8
    dtype: Any = jnp.float32
    # 's2b' runs dilated stages on space-to-batch subgrids (exact same
    # math; the isolated convs measure 1.07-1.11x faster,
    # tools/bench_dilated.py, but at batch 128 the per-stage regroup
    # transposes cost more than the conv gain: backbone 98.0 ms s2b vs
    # 89.9 ms direct). 'direct' (default) uses kernel-dilated convs.
    # Parameters are identical either way.
    dilated_impl: str = "direct"
    # 'packed4' computes the stem conv on the space-to-depth2-packed
    # 12-channel image (exact-math fold of the 7x7/2, see
    # fold_conv7_to_packed4) and also accepts pre-packed [b, h/2, w/2, 12]
    # input directly — the caller can then pack in uint8 (1/4 the relayout
    # bytes) or ship pre-packed rows, sidestepping the bf16 pack transpose
    # that refuted the in-graph form (CLAUDE.md: 10.9 vs 10.2 ms at b16).
    stem: str = "conv7"
    # Backbone stages (0-based: 2 = layer3, 3 = layer4) whose convs run
    # int8 at inference (ops/quant_conv.py — per-out-channel weight +
    # dynamic per-tensor activation PTQ; param tree unchanged, so trained
    # checkpoints load as-is). Training always runs the float path.
    quant_stages: Sequence[int] = ()
    quant_mode: str = "dynamic"   # ops/quant_conv.Conv.mode
    # 'NCHW' accepts a channel-major [b, 3, h, w] image: the stem conv
    # reads it directly via ("NCHW","HWIO","NHWC") dimension numbers (see
    # Conv.cm_input) so no c=3-minor NHWC tensor is ever materialized.
    # Everything past the stem is NHWC as usual; params are identical.
    input_layout: str = "NHWC"

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv = partial(nn.Conv, dtype=self.dtype)
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)

        if self.input_layout == "NCHW":
            assert self.stem == "conv7", \
                "input_layout='NCHW' requires the conv7 stem"
            x = Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                     use_bias=False, dtype=self.dtype,
                     kernel_init=he_fanout_normal(), cm_input=True)(x)
        elif self.stem == "packed4":
            if x.shape[-1] != 12:
                x = space_to_depth2(x)
            x = conv(64, (4, 4), padding=[(2, 1), (2, 1)], use_bias=False,
                     kernel_init=he_fanout_normal())(x)
        else:
            x = conv(64, (7, 7), strides=(2, 2), padding=[(3, 3)] * 2,
                     use_bias=False, kernel_init=he_fanout_normal())(x)
        x = norm()(x)
        x2s = nn.relu(x)
        x = nn.max_pool(x2s, (3, 3), strides=(2, 2), padding=[(1, 1)] * 2)

        # Stride/dilation schedule (ref resnet.py:167-198): current_stride
        # starts at 4 (conv1 + maxpool); each stage's stride becomes a
        # dilation multiplier once output_stride is reached.
        current_stride = 4
        dilation = 1
        feats = []
        for stage, (n_blocks, filters, stride) in enumerate(
                zip(self.stage_sizes, (64, 128, 256, 512), (1, 2, 2, 2))):
            if stride != 1:
                if current_stride == self.output_stride:
                    dilation *= stride
                    stride = 1
                else:
                    current_stride *= stride
            s2b = (self.dilated_impl == "s2b" and dilation > 1
                   and stride == 1
                   and x.shape[1] % dilation == 0
                   and x.shape[2] % dilation == 0)
            if s2b:
                batch = x.shape[0]
                x = space_to_batch(x, dilation)
            if stage in self.quant_stages and not train:
                from pvnet_tpu.ops.quant_conv import Conv as QConv
                conv_s = partial(QConv, dtype=self.dtype, quant=True,
                                 mode=self.quant_mode)
            else:
                conv_s = conv
            for i in range(n_blocks):
                x = self.block(filters, strides=stride if i == 0 else 1,
                               dilation=1 if s2b else dilation,
                               conv=conv_s, norm=norm)(x)
            if s2b:
                x = batch_to_space(x, dilation, batch)
            feats.append(x)

        x4s, x8s, x16s, x32s = feats
        return x2s, x4s, x8s, x16s, x32s


def resnet18_backbone(**kw) -> ResNetBackbone:
    return ResNetBackbone(block=BasicBlock, stage_sizes=(2, 2, 2, 2), **kw)


def resnet34_backbone(**kw) -> ResNetBackbone:
    return ResNetBackbone(block=BasicBlock, stage_sizes=(3, 4, 6, 3), **kw)


def resnet50_backbone(**kw) -> ResNetBackbone:
    return ResNetBackbone(block=Bottleneck, stage_sizes=(3, 4, 6, 3), **kw)
