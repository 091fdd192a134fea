"""PVNet: fully-convolutional seg + vector-field network in Flax.

TPU-native redesign of the reference's ``Resnet18_8s`` family
(ref lib/networks/model_repository.py:7-80): a dilated ResNet backbone at
output stride 8, a 3x3-conv "fc" head, and a skip-connected decoder that
upsamples 8s -> 4s -> 2s -> full resolution, finally emitting
``seg_dim + ver_dim`` channels split into segmentation logits and per-pixel
keypoint direction vectors.

The reference's ``nn.UpsamplingBilinear2d`` uses align_corners=True
(torch semantics); jax.image.resize uses half-pixel sampling, so upsampling
here is implemented as two tiny interpolation matmuls with align-corners
weights — which also happens to be the most MXU-friendly formulation.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.models.resnet import (BasicBlock, Bottleneck, ResNetBackbone,
                                     he_fanout_normal)


def _align_corners_matrix(out_size: int, in_size: int) -> np.ndarray:
    """[out, in] bilinear interpolation matrix with align_corners=True."""
    A = np.zeros((out_size, in_size), np.float32)
    if out_size == 1 or in_size == 1:
        A[:, 0] = 1.0
        return A
    pos = np.arange(out_size) * (in_size - 1) / (out_size - 1)
    lo = np.floor(pos).astype(np.int64)
    lo = np.minimum(lo, in_size - 2)
    w = (pos - lo).astype(np.float32)
    A[np.arange(out_size), lo] = 1.0 - w
    A[np.arange(out_size), lo + 1] += w
    return A


def upsample_bilinear_align_corners(x: jnp.ndarray, out_h: int, out_w: int
                                    ) -> jnp.ndarray:
    """NHWC bilinear resize matching torch UpsamplingBilinear2d
    (align_corners=True), expressed as two interpolation matmuls."""
    b, h, w, c = x.shape
    Ah = jnp.asarray(_align_corners_matrix(out_h, h), x.dtype)
    Aw = jnp.asarray(_align_corners_matrix(out_w, w), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", Ah, x)
    return jnp.einsum("pw,bowc->bopc", Aw, y)


class _HeadConvCMajor(nn.Module):
    """1x1 head conv emitting channel-major [b, C, h, w].

    Declares the same 'kernel'/'bias' params (same shapes, same init) as
    the nn.Conv it replaces, so checkpoints trained with either head
    layout interchange freely — only the emission layout differs. Emitting
    NCHW keeps (h, w) as the compact minor dims in HBM, which the
    stratified selection kernel streams without the ~12 ms/batch relayout
    the padded-channel NHWC emission costs (see ops/select_kernel.py).
    """
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cin = x.shape[-1]
        kernel = self.param("kernel", he_fanout_normal(),
                            (1, 1, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        # 1x1 conv as a dot with the feature dim LEADING, then a
        # major-dims transpose. conv_general_dilated with NCHW output
        # lowers to a minor-dims relayout (~17 ms/16-image batch at
        # 480x640); this form emits [c, b, h, w] directly and the
        # [c,b]<->[b,c] transpose moves whole contiguous (h, w) planes
        # (measured 4x faster end to end).
        y = jax.lax.dot_general(
            kernel[0, 0].astype(self.dtype), x.astype(self.dtype),
            (((0,), (3,)), ((), ())))                       # [c, b, h, w]
        y = y.transpose(1, 0, 2, 3)
        return y + bias.astype(y.dtype)[None, :, None, None]


class PVNet(nn.Module):
    """FCN emitting segmentation logits + keypoint vector field.

    Attributes mirror the reference ctor (ref model_repository.py:8):
      ver_dim: vector-field channels (2 * keypoint count).
      seg_dim: segmentation classes (2 for single-object).
      fcdim/s8dim/s4dim/s2dim/raw_dim: decoder widths.
      head_layout: 'NHWC' (default; returns [b, h, w, c] outputs) or
        'NCHW' (returns seg [b, seg_dim, h, w] and ver [b, ver_dim, h, w]
        — the TPU-preferred inference emission; same parameters either
        way, so checkpoints interchange).
    """
    ver_dim: int
    seg_dim: int = 2
    block: Any = BasicBlock
    stage_sizes: Tuple[int, ...] = (2, 2, 2, 2)
    fcdim: int = 256
    s8dim: int = 128
    s4dim: int = 64
    s2dim: int = 32
    raw_dim: int = 32
    dtype: Any = jnp.float32
    head_layout: str = "NHWC"
    stem: str = "conv7"          # 'packed4' = stem conv on s2d-packed rgb
    # Backbone stages to run int8 at inference (see ResNetBackbone
    # .quant_stages / ops/quant_conv.py); (2, 3) = layer3+layer4, the
    # backbone's ~86%-of-FLOPs dilated stages. () = float everywhere.
    quant_stages: Tuple[int, ...] = ()
    quant_mode: str = "dynamic"   # see ops/quant_conv.Conv.mode
    # int8 the decoder's two 128-multiple-channel convs (the fc head
    # Conv_0, 512->fcdim, and the 8s stage Conv_1, (fcdim+256)->s8dim) at
    # inference. Same param tree either way. Measured e2e on the TPU:
    # a WASH-to-slight-LOSS (727.7 vs 737.5 poses/s, b128) — at 60x80
    # the per-conv absmax+quantize passes eat the int8 MXU gain, unlike
    # the backbone's layer3/4 (ops/quant_conv.py). Kept as an
    # accuracy-tested option; default off.
    quant_decoder: bool = False
    # 'NCHW' accepts a channel-major [b, 3, h, w] image (the on-device
    # augmentation's native emission, augment_batch(out_layout='NCHW')):
    # the stem conv reads it via cm dimension numbers and the raw-stage
    # concat-conv is computed as a split kernel sum (resnet.Conv.cm_split)
    # — no [b, h, w, 3] tensor (42x lane-padded in HBM) is ever
    # materialized inside the program. Same params as NHWC input.
    input_layout: str = "NHWC"

    @nn.compact
    def __call__(self, x, train: bool = False,
                 return_tail_features: bool = False,
                 return_2s_features: bool = False,
                 return_4s_features: bool = False,
                 return_8s_features: bool = False):
        """x: [b, h, w, 3] normalized image (NHWC).

        Returns:
          seg_pred: [b, h, w, seg_dim] float32 logits.
          ver_pred: [b, h, w, ver_dim] float32 vector field.
        (head_layout='NCHW' returns [b, c, h, w] model-dtype tensors
        instead; return_tail_features=True returns the raw-stage input
        [b, h, w, 64k] — decoder features ++ rgb, zero-padded to a
        64-multiple;
        return_2s_features=True returns the 2s-stage activation
        [b, h/2, w/2, s2dim] *before* the final upsample — the packed
        inference tail's input, see ops/packed_tail.py;
        return_4s_features=True returns (fm4 [b, h/4, w/4, s4dim], x2s)
        — the 4s-stage activation before its upsample plus the backbone 2s
        skip, the deep packed tail's inputs, see
        packed_tail.packed_tail_deep_from_variables;
        return_8s_features=True returns (fm8 [b, h/8, w/8, s8dim], x4s,
        x2s) for the depth-3 packed path,
        packed_tail.packed_tail_deep3_from_variables.)
        """
        # input_layout='NCHW' models dispatch on the actual input shape, so
        # the same instance serves the cm training path AND NHWC eval /
        # inference callers (h, w are never 3, so the shapes disambiguate)
        cm_in = (self.input_layout == "NCHW" and x.ndim == 4
                 and x.shape[1] == 3 and x.shape[-1] != 3)
        if cm_in:                        # channel-major [b, 3, h, w]
            assert not (return_tail_features or return_2s_features
                        or return_4s_features or return_8s_features), \
                "channel-major input: feature-return paths unsupported"
            packed_in = False
            b, _, h, w = x.shape
        else:
            packed_in = x.shape[-1] == 12    # pre-packed rgb (stem='packed4')
            if packed_in:
                b, h2, w2, _ = x.shape
                h, w = 2 * h2, 2 * w2
            else:
                b, h, w, _ = x.shape
        x_in = x.astype(self.dtype)

        backbone = ResNetBackbone(block=self.block,
                                  stage_sizes=self.stage_sizes,
                                  output_stride=8, dtype=self.dtype,
                                  stem=self.stem,
                                  quant_stages=self.quant_stages,
                                  quant_mode=self.quant_mode,
                                  input_layout="NCHW" if cm_in else "NHWC")
        x2s, x4s, x8s, x16s, x32s = backbone(x_in, train=train)

        conv = partial(nn.Conv, dtype=self.dtype,
                       kernel_init=he_fanout_normal())
        if self.quant_decoder and not train:
            from pvnet_tpu.ops.quant_conv import Conv as QConv
            dconv = partial(QConv, dtype=self.dtype,
                            kernel_init=he_fanout_normal(), quant=True,
                            mode=self.quant_mode)
        else:
            dconv = conv
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        lrelu = partial(nn.leaky_relu, negative_slope=0.1)

        # fc head (ref model_repository.py:22-26)
        xfc = dconv(self.fcdim, (3, 3), padding=[(1, 1)] * 2,
                    use_bias=False)(x32s)
        xfc = nn.relu(norm()(xfc))

        # 8s -> 4s (ref :30-35)
        fm = dconv(self.s8dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(
            jnp.concatenate([xfc, x8s], axis=-1))
        fm = lrelu(norm()(fm))
        if return_8s_features:
            return fm, x4s, x2s
        fm = upsample_bilinear_align_corners(fm, x4s.shape[1], x4s.shape[2])

        # 4s -> 2s (ref :38-43)
        fm = conv(self.s4dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(
            jnp.concatenate([fm, x4s], axis=-1))
        fm = lrelu(norm()(fm))
        if return_4s_features:
            return fm, x2s
        fm = upsample_bilinear_align_corners(fm, x2s.shape[1], x2s.shape[2])

        # 2s -> raw (ref :46-51)
        fm = conv(self.s2dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(
            jnp.concatenate([fm, x2s], axis=-1))
        fm = lrelu(norm()(fm))
        if return_2s_features:
            return fm
        fm = upsample_bilinear_align_corners(fm, h, w)

        # raw head (ref :53-58)
        if cm_in:
            # concat-conv == sum of convs on the kernel's channel slices;
            # the rgb half reads the channel-major image directly
            # (resnet.Conv.cm_split) — same Conv_4 kernel param.
            from pvnet_tpu.models.resnet import Conv as CMConv
            out = CMConv(self.raw_dim, (3, 3), padding=[(1, 1)] * 2,
                         use_bias=False, dtype=self.dtype,
                         kernel_init=he_fanout_normal(),
                         cm_split=True)((fm, x_in))
            out = lrelu(norm()(out))
        else:
            if packed_in:
                from pvnet_tpu.models.resnet import depth_to_space2
                x_in = depth_to_space2(x_in)
            tail_in = jnp.concatenate([fm, x_in], axis=-1)
            if return_tail_features:
                cin = tail_in.shape[-1]
                pad = (-cin) % 64
                zeros = jnp.zeros(tail_in.shape[:-1] + (pad,),
                                  tail_in.dtype)
                return jnp.concatenate([tail_in, zeros], axis=-1)
            out = conv(self.raw_dim, (3, 3), padding=[(1, 1)] * 2,
                       use_bias=False)(tail_in)
            out = lrelu(norm()(out))

        if self.head_layout == "NCHW":
            # channel-major emission (model dtype, no f32 cast of the
            # full-res field): seg [b, seg, h, w], ver [b, ver, h, w]
            outc = _HeadConvCMajor(self.seg_dim + self.ver_dim,
                                   dtype=self.dtype, name="Conv_5")(out)
            return outc[:, :self.seg_dim], outc[:, self.seg_dim:]

        out = nn.Conv(self.seg_dim + self.ver_dim, (1, 1), dtype=self.dtype,
                      kernel_init=he_fanout_normal())(out)

        out = out.astype(jnp.float32)
        seg_pred = out[..., :self.seg_dim]
        ver_pred = out[..., self.seg_dim:]
        return seg_pred, ver_pred


def _half_pixel_down2_matrix(out_size: int) -> np.ndarray:
    """[out, 2*out] bilinear 0.5x downsample matrix with half-pixel
    sampling (torch F.interpolate(scale_factor=0.5, mode='bilinear',
    align_corners=False) semantics): source pos = 2*i + 0.5, i.e. the mean
    of each adjacent pixel pair."""
    A = np.zeros((out_size, 2 * out_size), np.float32)
    A[np.arange(out_size), 2 * np.arange(out_size)] = 0.5
    A[np.arange(out_size), 2 * np.arange(out_size) + 1] = 0.5
    return A


def downsample_bilinear_half(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC 0.5x bilinear downsample matching torch F.interpolate
    (align_corners=False), as two interpolation matmuls."""
    b, h, w, c = x.shape
    Ah = jnp.asarray(_half_pixel_down2_matrix(h // 2), x.dtype)
    Aw = jnp.asarray(_half_pixel_down2_matrix(w // 2), x.dtype)
    y = jnp.einsum("oh,bhwc->bowc", Ah, x)
    return jnp.einsum("pw,bowc->bopc", Aw, y)


class PVNet2o(nn.Module):
    """Half-resolution-output PVNet variant (ref Resnet50_8s_2o,
    model_repository.py:158-224).

    The decoder stops at stride 2: conv8s -> up -> conv4s -> up -> a 2s
    stage whose input concatenates the decoder features, the backbone's
    x2s skip, and a 0.5x bilinearly downsampled copy of the input image
    (ref :219-220), then emits seg_dim + ver_dim channels at h/2 x w/2.
    Unused by the shipped training recipe; inventoried for parity.
    """
    ver_dim: int
    seg_dim: int = 2
    block: Any = Bottleneck
    stage_sizes: Tuple[int, ...] = (3, 4, 6, 3)
    fcdim: int = 384
    s8dim: int = 256
    s4dim: int = 128
    s2dim: int = 64
    dtype: Any = jnp.float32
    quant_stages: Tuple[int, ...] = ()   # see PVNet.quant_stages
    quant_mode: str = "dynamic"

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: [b, h, w, 3] NHWC (h, w even). Returns
        (seg [b, h/2, w/2, seg_dim], ver [b, h/2, w/2, ver_dim])."""
        x_in = x.astype(self.dtype)

        backbone = ResNetBackbone(block=self.block,
                                  stage_sizes=self.stage_sizes,
                                  output_stride=8, dtype=self.dtype,
                                  quant_stages=self.quant_stages,
                                  quant_mode=self.quant_mode)
        x2s, x4s, x8s, x16s, x32s = backbone(x_in, train=train)

        conv = partial(nn.Conv, dtype=self.dtype,
                       kernel_init=he_fanout_normal())
        norm = partial(nn.BatchNorm, use_running_average=not train,
                       momentum=0.9, epsilon=1e-5, dtype=self.dtype)
        lrelu = partial(nn.leaky_relu, negative_slope=0.1)

        xfc = conv(self.fcdim, (3, 3), padding=[(1, 1)] * 2,
                   use_bias=False)(x32s)
        xfc = nn.relu(norm()(xfc))

        fm = conv(self.s8dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(
            jnp.concatenate([xfc, x8s], axis=-1))
        fm = lrelu(norm()(fm))
        fm = upsample_bilinear_align_corners(fm, x4s.shape[1], x4s.shape[2])

        fm = conv(self.s4dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(
            jnp.concatenate([fm, x4s], axis=-1))
        fm = lrelu(norm()(fm))
        fm = upsample_bilinear_align_corners(fm, x2s.shape[1], x2s.shape[2])

        x_ds = downsample_bilinear_half(x_in)
        fm = conv(self.s2dim, (3, 3), padding=[(1, 1)] * 2, use_bias=False)(
            jnp.concatenate([fm, x2s, x_ds], axis=-1))
        fm = lrelu(norm()(fm))
        out = nn.Conv(self.seg_dim + self.ver_dim, (1, 1), dtype=self.dtype,
                      kernel_init=he_fanout_normal())(fm)

        out = out.astype(jnp.float32)
        return out[..., :self.seg_dim], out[..., self.seg_dim:]


def pvnet_resnet18(ver_dim: int, seg_dim: int = 2, **kw) -> PVNet:
    """Resnet18_8s equivalent — THE production model
    (ref model_repository.py:7-80, train_linemod.py:256)."""
    return PVNet(ver_dim=ver_dim, seg_dim=seg_dim, block=BasicBlock,
                 stage_sizes=(2, 2, 2, 2), **kw)


def pvnet_resnet34(ver_dim: int, seg_dim: int = 2, **kw) -> PVNet:
    """Resnet34_8s equivalent (ref model_repository.py:226-300)."""
    return PVNet(ver_dim=ver_dim, seg_dim=seg_dim, block=BasicBlock,
                 stage_sizes=(3, 4, 6, 3), **kw)


def pvnet_resnet50(ver_dim: int, seg_dim: int = 2, **kw) -> PVNet:
    """Resnet50_8s equivalent (ref model_repository.py:82-156)."""
    kw.setdefault("fcdim", 384)
    kw.setdefault("s8dim", 256)
    kw.setdefault("s4dim", 128)
    kw.setdefault("s2dim", 64)
    kw.setdefault("raw_dim", 64)
    return PVNet(ver_dim=ver_dim, seg_dim=seg_dim, block=Bottleneck,
                 stage_sizes=(3, 4, 6, 3), **kw)


def pvnet_resnet50_2o(ver_dim: int, seg_dim: int = 2, **kw) -> PVNet2o:
    """Resnet50_8s_2o equivalent — half-resolution output
    (ref model_repository.py:158-224)."""
    return PVNet2o(ver_dim=ver_dim, seg_dim=seg_dim, **kw)


def build_model(network: str, ver_dim: int, seg_dim: int = 2, **kw) -> PVNet:
    """Factory keyed by the recipe's ``network`` field
    (ref configs/linemod_train.json: "resnet18_8s")."""
    factories = {
        "resnet18_8s": pvnet_resnet18,
        "resnet34_8s": pvnet_resnet34,
        "resnet50_8s": pvnet_resnet50,
        "resnet50_8s_2o": pvnet_resnet50_2o,
    }
    if network not in factories:
        raise ValueError(f"unknown network '{network}'; "
                         f"expected one of {sorted(factories)}")
    return factories[network](ver_dim, seg_dim, **kw)
