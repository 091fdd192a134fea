"""Training losses and segmentation quality stats.

Matches the reference's objective exactly: per-pixel cross-entropy on the
segmentation logits averaged per sample (ref tools/train_linemod.py:83-88)
plus a masked smooth-L1 on the vertex field normalized by foreground pixel
count (ref lib/utils/net_utils.py:54-79), combined with vertex_loss_ratio
(ref train_linemod.py:148).

Every function takes ``channel_axis`` (-1 for NHWC predictions, 1 for the
channel-major NCHW head). The NCHW form is the TPU-fast one: full-res
[b, c, h, w] tensors keep w (a 128-multiple) as the minor dim, so the
loss's elementwise passes stream at HBM roofline — the NHWC head's
[b, h, w, 18]/[b, h, w, 2] tensors are lane-padded 7x/64x in HBM and every
pass over them pays the padded physical traffic (CLAUDE.md layout rules).
Arithmetic is in f32 regardless of input dtype (the NCHW head emits model
dtype, e.g. bf16); sums accumulate f32.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def seg_loss(seg_pred: jnp.ndarray, mask: jnp.ndarray,
             channel_axis: int = -1) -> jnp.ndarray:
    """Per-pixel softmax cross-entropy, mean over pixels per sample.

    Args:
      seg_pred: [b, h, w, c] (channel_axis=-1) or [b, c, h, w]
        (channel_axis=1) logits.
      mask:     [b, h, w] integer labels.
    Returns:
      [b] per-sample loss.
    """
    logp = jax.nn.log_softmax(seg_pred.astype(jnp.float32),
                              axis=channel_axis)
    labels = mask.astype(jnp.int32)
    if channel_axis in (-1, logp.ndim - 1):
        ll = jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    else:
        ll = jnp.take_along_axis(logp, labels[:, None], axis=1)[:, 0]
    return -jnp.mean(ll.reshape(ll.shape[0], -1), axis=1)


def smooth_l1_vertex_loss(ver_pred: jnp.ndarray, ver_target: jnp.ndarray,
                          ver_weights: jnp.ndarray, sigma: float = 1.0,
                          normalize: bool = True,
                          channel_axis: int = -1) -> jnp.ndarray:
    """Masked smooth-L1 on the vertex field (ref net_utils.py:54-79).

    The weight multiplies the *difference* before the robust kernel (exactly
    as the reference does), and normalization divides by
    ver_dim * sum(weights) + 1e-3.

    Args:
      ver_pred:    [b, h, w, ver_dim] or [b, ver_dim, h, w]
      ver_target:  same layout as ver_pred
      ver_weights: [b, h, w, 1] or [b, 1, h, w] (foreground indicator)
    Returns:
      [b] per-sample loss.
    """
    b = ver_pred.shape[0]
    ver_dim = ver_pred.shape[channel_axis]
    sigma2 = sigma ** 2
    diff = ver_weights.astype(jnp.float32) * (
        ver_pred.astype(jnp.float32) - ver_target.astype(jnp.float32))
    abs_diff = jnp.abs(diff)
    quad = abs_diff < (1.0 / sigma2)
    loss = jnp.where(quad, 0.5 * sigma2 * diff * diff,
                     abs_diff - 0.5 / sigma2)
    loss = jnp.sum(loss.reshape(b, -1), axis=1)
    if normalize:
        wsum = jnp.sum(ver_weights.astype(jnp.float32).reshape(b, -1),
                       axis=1)
        loss = loss / (ver_dim * wsum + 1e-3)
    return loss


def total_loss(seg_pred, ver_pred, mask, ver_target, ver_weights,
               vertex_loss_ratio: float = 1.0, channel_axis: int = -1
               ) -> Tuple[jnp.ndarray, dict]:
    """Combined objective (ref train_linemod.py:146-148). Returns scalar
    loss and a metrics dict."""
    ls = seg_loss(seg_pred, mask, channel_axis)
    lv = smooth_l1_vertex_loss(ver_pred, ver_target, ver_weights,
                               channel_axis=channel_axis)
    precision, recall = precision_recall(seg_pred, mask, channel_axis)
    loss = jnp.mean(ls) + jnp.mean(lv) * vertex_loss_ratio
    metrics = {
        "loss": loss,
        "seg_loss": jnp.mean(ls),
        "ver_loss": jnp.mean(lv),
        "precision": jnp.mean(precision),
        "recall": jnp.mean(recall),
    }
    return loss, metrics


def precision_recall(seg_pred: jnp.ndarray, mask: jnp.ndarray,
                     channel_axis: int = -1
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Foreground precision/recall with +1 smoothing
    (ref net_utils.py:329-348).

    Args:
      seg_pred: [b, h, w, c] or [b, c, h, w] logits; mask: [b, h, w].
    Returns:
      ([b] precision, [b] recall).
    """
    b = seg_pred.shape[0]
    preds = jnp.argmax(seg_pred, axis=channel_axis).astype(jnp.float32)
    target = mask.astype(jnp.float32)
    tp = jnp.sum((preds * target).reshape(b, -1), axis=1)
    fp = jnp.sum((preds * (1 - target)).reshape(b, -1), axis=1)
    fn = jnp.sum(((1 - preds) * target).reshape(b, -1), axis=1)
    precision = (tp + 1) / (tp + fp + 1)
    recall = (tp + 1) / (tp + fn + 1)
    return precision, recall


def compute_precision_multi_class(seg_pred: jnp.ndarray, mask: jnp.ndarray,
                                  reduce: bool = False,
                                  channel_axis: int = -1) -> jnp.ndarray:
    """Per-image pixel accuracy over all classes
    (ref net_utils.py:compute_precision_multi_class :350-359).

    Args:
      seg_pred: [b, h, w, c] or [b, c, h, w] logits; mask: [b, h, w].
    Returns:
      [b] accuracy, or scalar mean with reduce=True.
    """
    b = seg_pred.shape[0]
    n_px = mask.shape[1] * mask.shape[2]
    preds = jnp.argmax(seg_pred, axis=channel_axis)
    correct = (preds == mask).reshape(b, -1).astype(jnp.float32)
    precision = jnp.sum(correct, axis=1) / n_px
    return jnp.mean(precision) if reduce else precision
