"""Host-side image augmentation (numpy/cv2), reference-faithful.

Ports the semantics of ref lib/datasets/augmentation.py: instance-centered
rotation, crop-resize keeping a minimum instance overlap, fixed-size
crop-or-pad, random occluder mask-out, blur, flip, plus a torchvision-free
color jitter. Homogeneous keypoint coordinates (hcoords [k, 3]) transform
alongside the image exactly as the reference's.

These run in the host input pipeline (the reference uses 12 DataLoader
workers; here a threaded prefetcher) — none of this is on the jitted path.
"""
from __future__ import annotations

from typing import Tuple

import cv2
import numpy as np


def rotate_instance(img, mask, hcoords, rot_ang_min, rot_ang_max, rng):
    """Rotate around the instance centroid (ref augmentation.py:55-64)."""
    h, w = img.shape[0], img.shape[1]
    degree = rng.uniform(rot_ang_min, rot_ang_max)
    hs, ws = np.nonzero(mask)
    R = cv2.getRotationMatrix2D((float(np.mean(ws)), float(np.mean(hs))),
                                degree, 1)
    mask = cv2.warpAffine(mask, R, (w, h), flags=cv2.INTER_NEAREST,
                          borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    img = cv2.warpAffine(img, R, (w, h), flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    last_row = np.asarray([[0, 0, 1]], np.float32)
    hcoords = np.matmul(hcoords,
                        np.concatenate([R, last_row], 0).transpose())
    return img, mask, hcoords


def flip(img, mask, hcoords):
    """Horizontal flip (ref augmentation.py:66-73)."""
    img = np.flip(img, 1)
    mask = np.flip(mask, 1)
    w = img.shape[1]
    hcoords = hcoords.copy()
    hcoords[:, 0] -= w / 2 * hcoords[:, 2]
    hcoords[:, 0] = -hcoords[:, 0]
    hcoords[:, 0] += w / 2 * hcoords[:, 2]
    return img, mask, hcoords


def crop_or_padding_to_fixed_size_instance(img, mask, hcoords, th, tw,
                                           overlap_ratio, rng):
    """Fixed-size crop keeping >= overlap_ratio of the instance bbox inside
    (ref augmentation.py:118-158)."""
    h, w = img.shape[0], img.shape[1]
    hs, ws = np.nonzero(mask)
    hmin, hmax = np.min(hs), np.max(hs)
    wmin, wmax = np.min(ws), np.max(ws)
    box_h, box_w = hmax - hmin, wmax - wmin
    hpad, wpad = th >= h, tw >= w

    row_beg_hi = int(min(hmin + overlap_ratio * box_h, h - th))
    row_beg_lo = int(max(hmin + overlap_ratio * box_h - th, 0))
    col_beg_hi = int(min(wmin + overlap_ratio * box_w, w - tw))
    col_beg_lo = int(max(wmin + overlap_ratio * box_w - tw, 0))

    hbeg = 0 if hpad else rng.randint(row_beg_lo, max(row_beg_hi, row_beg_lo + 1))
    wbeg = 0 if wpad else rng.randint(col_beg_lo, max(col_beg_hi, col_beg_lo + 1))

    img = img[hbeg:hbeg + th, wbeg:wbeg + tw]
    mask = mask[hbeg:hbeg + th, wbeg:wbeg + tw]
    hcoords = hcoords.copy()
    hcoords[:, 0] -= wbeg * hcoords[:, 2]
    hcoords[:, 1] -= hbeg * hcoords[:, 2]

    if hpad or wpad:
        nh, nw = img.shape[0], img.shape[1]
        new_img = np.zeros([th, tw, 3], dtype=img.dtype)
        new_mask = np.zeros([th, tw], dtype=mask.dtype)
        hoff = 0 if not hpad else (th - h) // 2
        woff = 0 if not wpad else (tw - w) // 2
        new_img[hoff:hoff + nh, woff:woff + nw] = img
        new_mask[hoff:hoff + nh, woff:woff + nw] = mask
        hcoords[:, 0] += woff * hcoords[:, 2]
        hcoords[:, 1] += hoff * hcoords[:, 2]
        img, mask = new_img, new_mask
    return img, mask, hcoords


def crop_or_padding_to_fixed_size(img, mask, th, tw, rng):
    """Background-only fixed-size crop/pad (ref augmentation.py:160-185)."""
    h, w = img.shape[0], img.shape[1]
    hpad, wpad = th >= h, tw >= w
    hbeg = 0 if hpad else rng.randint(0, h - th)
    wbeg = 0 if wpad else rng.randint(0, w - tw)
    img = img[hbeg:hbeg + th, wbeg:wbeg + tw]
    mask = mask[hbeg:hbeg + th, wbeg:wbeg + tw]
    if hpad or wpad:
        nh, nw = img.shape[0], img.shape[1]
        new_img = np.zeros([th, tw, 3], dtype=img.dtype)
        new_mask = np.zeros([th, tw], dtype=mask.dtype)
        hoff = 0 if not hpad else (th - h) // 2
        woff = 0 if not wpad else (tw - w) // 2
        new_img[hoff:hoff + nh, woff:woff + nw] = img
        new_mask[hoff:hoff + nh, woff:woff + nw] = mask
        img, mask = new_img, new_mask
    return img, mask


def crop_resize_instance_v1(img, mask, hcoords, imheight, imwidth,
                            overlap_ratio, ratio_min, ratio_max, rng):
    """Crop a region of [imheight, imwidth] * ratio containing the instance,
    then resize to [imheight, imwidth] (ref augmentation.py:250-279; the
    shipped recipe path since use_old=true, configs/linemod_train.json:50).
    """
    resize_ratio = rng.uniform(ratio_min, ratio_max)
    th = int(imheight * resize_ratio)
    tw = int(imwidth * resize_ratio)
    img, mask, hcoords = crop_or_padding_to_fixed_size_instance(
        img, mask, hcoords, th, tw, overlap_ratio, rng)
    img = cv2.resize(img, (imwidth, imheight),
                     interpolation=cv2.INTER_LINEAR)
    mask = cv2.resize(mask, (imwidth, imheight),
                      interpolation=cv2.INTER_NEAREST)
    hcoords = hcoords.copy()
    hcoords[:, 0] = hcoords[:, 0] / resize_ratio
    hcoords[:, 1] = hcoords[:, 1] / resize_ratio
    return img, mask, hcoords


def compute_resize_range(mask, hmin, hmax, wmin, wmax):
    """(ref augmentation.py:235-247)"""
    ys, xs = np.nonzero(mask)
    xlen = max(int(np.max(xs) - np.min(xs)), 1)
    ylen = max(int(np.max(ys) - np.min(ys)), 1)
    rmin, rmax = wmin / xlen, wmax / xlen
    rmax = min(rmax, hmax / ylen)
    rmin = max(rmin, hmin / ylen)
    return rmin, rmax


def crop_resize_instance_v2(img, mask, hcoords, imheight, imwidth,
                            overlap_ratio, hmin, hmax, wmin, wmax, rng):
    """80%-probability instance-size-normalizing resize, then fixed-size
    instance crop (ref augmentation.py:281-313)."""
    if rng.random() < 0.8:
        rmin, rmax = compute_resize_range(mask, hmin, hmax, wmin, wmax)
        if rmax > rmin:
            resize_ratio = rng.uniform(rmin, rmax)
        else:
            resize_ratio = rmin
        h, w = mask.shape
        th, tw = int(h * resize_ratio), int(w * resize_ratio)
        img = cv2.resize(img, (tw, th), interpolation=cv2.INTER_LINEAR)
        mask = cv2.resize(mask, (tw, th), interpolation=cv2.INTER_NEAREST)
        hcoords = hcoords.copy()
        hcoords[:, 0] = hcoords[:, 0] * resize_ratio
        hcoords[:, 1] = hcoords[:, 1] * resize_ratio
    return crop_or_padding_to_fixed_size_instance(
        img, mask, hcoords, imheight, imwidth, overlap_ratio, rng)


def mask_out_instance(img, mask, min_side, max_side, rng):
    """Random occluder rectangle over the instance
    (ref augmentation.py:187-202)."""
    ys, xs = np.nonzero(mask)
    xmin, xmax = np.min(xs), np.max(xs)
    ymin, ymax = np.min(ys), np.max(ys)
    xlen, ylen = xmax - xmin, ymax - ymin
    x_side = int(xlen * rng.uniform(min_side, max_side) / 2)
    y_side = int(ylen * rng.uniform(min_side, max_side) / 2)
    x_loc = rng.randint(xmin, max(xmax, xmin + 1))
    y_loc = rng.randint(ymin, max(ymax, ymin + 1))
    img = img.copy()
    mask = mask.copy()
    region = img[y_loc - y_side:y_loc + y_side,
                 x_loc - x_side:x_loc + x_side]
    img[y_loc - y_side:y_loc + y_side, x_loc - x_side:x_loc + x_side] = \
        rng.randint(0, 255, region.shape)
    mask[y_loc - y_side:y_loc + y_side, x_loc - x_side:x_loc + x_side] = 0
    return img, mask


def blur_image(img, sigma):
    """Gaussian blur with a sigma-sized kernel (ref augmentation.py:204-205
    — the reference's blur is deterministic given the kernel size; the
    caller randomizes sigma, see dataset.py)."""
    return cv2.GaussianBlur(img, (sigma, sigma), 0)


def color_jitter(img: np.ndarray, brightness: float, contrast: float,
                 saturation: float, hue: float, rng) -> np.ndarray:
    """torchvision.ColorJitter-equivalent without torchvision
    (ref linemod_dataset.py:185-190): multiplicative brightness/contrast/
    saturation factors drawn from [1-x, 1+x], additive hue in [-hue, hue]
    turns, applied in random order.
    """
    fb = rng.uniform(max(0, 1 - brightness), 1 + brightness) \
        if brightness > 0 else 1.0
    fc = rng.uniform(max(0, 1 - contrast), 1 + contrast) \
        if contrast > 0 else 1.0
    fs = rng.uniform(max(0, 1 - saturation), 1 + saturation) \
        if saturation > 0 else 1.0
    f_hue = rng.uniform(-hue, hue) if hue > 0 else 0.0

    # brightness/contrast/saturation compose into one fused-multiply-add:
    #   x' = a*x + b*gray(x) + c   with
    #   a = fb*fc*fs, b = fb*fc*(1-fs), c = fb*(1-fc)*mean_gray
    # (single pass instead of the reference transform stack's per-op
    # full-image passes + clips; identical up to op ordering, which is
    # random in torchvision anyway)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    a = fb * fc * fs
    bcoef = fb * fc * (1.0 - fs)
    ccoef = fb * (1.0 - fc) * float(gray.mean())
    out = a * img.astype(np.float32) \
        + bcoef * gray.astype(np.float32)[..., None] + ccoef
    out = np.clip(out, 0, 255).astype(np.uint8)

    if f_hue != 0.0:
        hsv = cv2.cvtColor(out, cv2.COLOR_RGB2HSV)
        hshift = np.uint8(int(f_hue * 180.0) % 180)
        hsv[..., 0] = (hsv[..., 0] + hshift) % 180
        out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return out


def fused_rotate_crop_resize(img, mask, hcoords, imheight, imwidth,
                             rot_ang_min, rot_ang_max, overlap_ratio,
                             ratio_min, ratio_max, rng):
    """One-warp equivalent of rotate_instance + crop_or_padding_to_
    fixed_size_instance + resize (the reference's use_old=true train path,
    ref augmentation.py:55-64,118-158,250-279) composed into a single
    affine map sampled directly at the target size.

    The reference warps the full 480x640 frame twice and then resizes; on a
    single-core host that triple pass dominates training step time. The
    composed warp is the same affine transform (one bilinear resampling
    instead of two, which only *reduces* interpolation blur); the crop
    range is computed from the rotated bbox corners rather than the
    rotated mask rasterization — identical when the instance bbox is
    tight, and only the random crop-offset distribution shifts slightly
    otherwise.
    """
    h, w = img.shape[0], img.shape[1]
    hs, ws = np.nonzero(mask)
    cx, cy = float(np.mean(ws)), float(np.mean(hs))

    degree = rng.uniform(rot_ang_min, rot_ang_max)
    R = cv2.getRotationMatrix2D((cx, cy), degree, 1)      # src -> rotated

    # rotated-frame instance bbox from the corner transform
    corners = np.array([[ws.min(), hs.min(), 1], [ws.min(), hs.max(), 1],
                        [ws.max(), hs.min(), 1], [ws.max(), hs.max(), 1]],
                       np.float64)
    rc = corners @ R.T                                    # [4, 2]
    wmin, wmax = rc[:, 0].min(), rc[:, 0].max()
    hmin, hmax = rc[:, 1].min(), rc[:, 1].max()
    box_h, box_w = hmax - hmin, wmax - wmin

    resize_ratio = rng.uniform(ratio_min, ratio_max)
    th = int(imheight * resize_ratio)
    tw = int(imwidth * resize_ratio)

    hpad, wpad = th >= h, tw >= w
    row_beg_hi = int(min(hmin + overlap_ratio * box_h, h - th))
    row_beg_lo = int(max(hmin + overlap_ratio * box_h - th, 0))
    col_beg_hi = int(min(wmin + overlap_ratio * box_w, w - tw))
    col_beg_lo = int(max(wmin + overlap_ratio * box_w - tw, 0))
    if hpad:
        hbeg = -((th - h) // 2)
    else:
        hbeg = rng.randint(row_beg_lo, max(row_beg_hi, row_beg_lo + 1))
    if wpad:
        wbeg = -((tw - w) // 2)
    else:
        wbeg = rng.randint(col_beg_lo, max(col_beg_hi, col_beg_lo + 1))

    # full map: resize(1/ratio) o translate(-beg) o rotate
    s = 1.0 / resize_ratio
    M = R.copy()
    M[0] = (R[0] - np.array([0, 0, wbeg])) * s
    M[1] = (R[1] - np.array([0, 0, hbeg])) * s

    img = cv2.warpAffine(img, M, (imwidth, imheight),
                         flags=cv2.INTER_LINEAR,
                         borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    mask = cv2.warpAffine(mask, M, (imwidth, imheight),
                          flags=cv2.INTER_NEAREST,
                          borderMode=cv2.BORDER_CONSTANT, borderValue=0)
    last_row = np.asarray([[0, 0, 1]], np.float32)
    hcoords = np.matmul(hcoords,
                        np.concatenate([M, last_row], 0).transpose())
    return img, mask, hcoords


def add_noise(image, rng):
    """Gaussian noise (90%) or motion blur (10%) (ref augmentation.py:
    207-233)."""
    if rng.rand() < 0.9:
        row, col, ch = image.shape
        var = rng.rand() * 0.3 * 256
        sigma = var ** 0.5
        gauss = sigma * rng.randn(row, col)
        gauss = np.repeat(gauss[:, :, None], ch, axis=2)
        noisy = np.clip(image + gauss, 0, 255).astype(np.uint8)
    else:
        sizes = [3, 5, 7, 9, 11, 15]
        size = sizes[rng.randint(len(sizes))]
        kernel = np.zeros((size, size))
        if rng.rand() < 0.5:
            kernel[(size - 1) // 2, :] = 1.0
        else:
            kernel[:, (size - 1) // 2] = 1.0
        kernel /= size
        noisy = cv2.filter2D(image, -1, kernel)
    return noisy
