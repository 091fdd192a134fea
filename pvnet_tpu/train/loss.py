"""Training losses and segmentation quality stats.

Matches the reference's objective exactly: per-pixel cross-entropy on the
segmentation logits averaged per sample (ref tools/train_linemod.py:83-88)
plus a masked smooth-L1 on the vertex field normalized by foreground pixel
count (ref lib/utils/net_utils.py:54-79), combined with vertex_loss_ratio
(ref train_linemod.py:148).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def seg_loss(seg_pred: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel softmax cross-entropy, mean over pixels per sample.

    Args:
      seg_pred: [b, h, w, c] logits.
      mask:     [b, h, w] integer labels.
    Returns:
      [b] per-sample loss.
    """
    logp = jax.nn.log_softmax(seg_pred, axis=-1)
    ll = jnp.take_along_axis(logp, mask[..., None].astype(jnp.int32),
                             axis=-1)[..., 0]
    return -jnp.mean(ll.reshape(ll.shape[0], -1), axis=1)


def smooth_l1_vertex_loss(ver_pred: jnp.ndarray, ver_target: jnp.ndarray,
                          ver_weights: jnp.ndarray, sigma: float = 1.0,
                          normalize: bool = True) -> jnp.ndarray:
    """Masked smooth-L1 on the vertex field (ref net_utils.py:54-79).

    The weight multiplies the *difference* before the robust kernel (exactly
    as the reference does), and normalization divides by
    ver_dim * sum(weights) + 1e-3.

    Args:
      ver_pred:    [b, h, w, ver_dim]
      ver_target:  [b, h, w, ver_dim]
      ver_weights: [b, h, w, 1] (foreground indicator)
    Returns:
      [b] per-sample loss.
    """
    b = ver_pred.shape[0]
    ver_dim = ver_pred.shape[-1]
    sigma2 = sigma ** 2
    diff = ver_weights * (ver_pred - ver_target)
    abs_diff = jnp.abs(diff)
    quad = abs_diff < (1.0 / sigma2)
    loss = jnp.where(quad, 0.5 * sigma2 * diff * diff,
                     abs_diff - 0.5 / sigma2)
    loss = jnp.sum(loss.reshape(b, -1), axis=1)
    if normalize:
        wsum = jnp.sum(ver_weights.reshape(b, -1), axis=1)
        loss = loss / (ver_dim * wsum + 1e-3)
    return loss


def total_loss(seg_pred, ver_pred, mask, ver_target, ver_weights,
               vertex_loss_ratio: float = 1.0
               ) -> Tuple[jnp.ndarray, dict]:
    """Combined objective (ref train_linemod.py:146-148). Returns scalar
    loss and a metrics dict."""
    ls = seg_loss(seg_pred, mask)
    lv = smooth_l1_vertex_loss(ver_pred, ver_target, ver_weights)
    precision, recall = precision_recall(seg_pred, mask)
    loss = jnp.mean(ls) + jnp.mean(lv) * vertex_loss_ratio
    metrics = {
        "loss": loss,
        "seg_loss": jnp.mean(ls),
        "ver_loss": jnp.mean(lv),
        "precision": jnp.mean(precision),
        "recall": jnp.mean(recall),
    }
    return loss, metrics


def precision_recall(seg_pred: jnp.ndarray, mask: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Foreground precision/recall with +1 smoothing
    (ref net_utils.py:329-348).

    Args:
      seg_pred: [b, h, w, c] logits; mask: [b, h, w] labels.
    Returns:
      ([b] precision, [b] recall).
    """
    b = seg_pred.shape[0]
    preds = jnp.argmax(seg_pred, axis=-1).astype(jnp.float32)
    target = mask.astype(jnp.float32)
    tp = jnp.sum((preds * target).reshape(b, -1), axis=1)
    fp = jnp.sum((preds * (1 - target)).reshape(b, -1), axis=1)
    fn = jnp.sum(((1 - preds) * target).reshape(b, -1), axis=1)
    precision = (tp + 1) / (tp + fp + 1)
    recall = (tp + 1) / (tp + fn + 1)
    return precision, recall


def compute_precision_multi_class(seg_pred: jnp.ndarray, mask: jnp.ndarray,
                                  reduce: bool = False) -> jnp.ndarray:
    """Per-image pixel accuracy over all classes
    (ref net_utils.py:compute_precision_multi_class :350-359).

    Args:
      seg_pred: [b, h, w, c] logits; mask: [b, h, w] integer labels.
    Returns:
      [b] accuracy, or scalar mean with reduce=True.
    """
    b, h, w, _ = seg_pred.shape
    preds = jnp.argmax(seg_pred, axis=-1)
    correct = (preds == mask).reshape(b, -1).astype(jnp.float32)
    precision = jnp.sum(correct, axis=1) / (h * w)
    return jnp.mean(precision) if reduce else precision
