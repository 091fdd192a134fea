"""Visualization helpers (ref lib/utils/draw_utils.py semantics).

matplotlib-based overlays (3D bbox wireframes, hypothesis scatters,
covariance ellipses) plus numpy colorize/grid helpers used by the training
recorder. All functions accept/return numpy; nothing here is on the jitted
path.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD

# Cityscapes-style label palette (ref net_utils.py:152-171)
_COLORS = np.array([
    [0, 0, 0], [128, 64, 128], [244, 35, 232], [70, 70, 70],
    [102, 102, 156], [190, 153, 153], [153, 153, 153], [250, 170, 30],
    [220, 220, 0], [107, 142, 35], [152, 251, 152], [0, 130, 180],
    [220, 20, 60], [255, 0, 0], [0, 0, 142], [0, 0, 70], [0, 60, 100],
    [0, 80, 100], [0, 0, 230], [119, 11, 32]], np.uint8)

# Edges of an axis-aligned 3D box given the reference's corner ordering
# (ref draw_utils.py:visualize_bounding_box :9-46 draws these quads)
_BOX_EDGES = [(0, 1), (0, 2), (1, 3), (2, 3),
              (4, 5), (4, 6), (5, 7), (6, 7),
              (0, 4), (1, 5), (2, 6), (3, 7)]


def imagenet_to_uint8(img: np.ndarray) -> np.ndarray:
    """Undo ImageNet normalization; [h, w, 3] float -> uint8
    (ref draw_utils.py:279-296, NHWC here)."""
    out = (img * IMAGENET_STD + IMAGENET_MEAN) * 255.0
    return np.clip(out, 0, 255).astype(np.uint8)


def colorize_segmentation(labels: np.ndarray) -> np.ndarray:
    """[b, h, w] int labels -> [b, h, w, 3] uint8 palette image."""
    return _COLORS[np.clip(labels, 0, len(_COLORS) - 1)]


def colorize_vertex_field(ver: np.ndarray, weights: np.ndarray
                          ) -> np.ndarray:
    """First (x, y) channel pair -> colormapped [2b, h, w, 3] uint8
    (ref net_utils.py:rec_vertex :229-239)."""
    from matplotlib import cm
    v = (ver[..., :2] * weights + 1.0) / 2.0            # [b, h, w, 2]
    v = np.moveaxis(v, -1, 1).reshape(-1, *v.shape[1:3])
    mapped = cm.viridis(np.clip(v, 0, 1))[..., :3]
    return (mapped * 255).astype(np.uint8)


def make_grid(imgs: np.ndarray, nrow: int = 5, pad: int = 2) -> np.ndarray:
    """Tile [n, h, w, 3] uint8 into one grid image."""
    n, h, w, c = imgs.shape
    ncol = nrow
    nrows = (n + ncol - 1) // ncol
    grid = np.zeros((nrows * (h + pad) - pad, ncol * (w + pad) - pad, c),
                    imgs.dtype)
    for i in range(n):
        r, col = divmod(i, ncol)
        grid[r * (h + pad):r * (h + pad) + h,
             col * (w + pad):col * (w + pad) + w] = imgs[i]
    return grid


def img_pts_to_pts_img(img_pts: np.ndarray, h: int, w: int) -> np.ndarray:
    """Splat 2D points into a binary [h, w] image
    (ref draw_utils.py:309-320)."""
    out = np.zeros((h, w), np.uint8)
    xs = np.round(img_pts[:, 0]).astype(np.int64)
    ys = np.round(img_pts[:, 1]).astype(np.int64)
    keep = (xs >= 0) & (xs < w) & (ys >= 0) & (ys < h)
    out[ys[keep], xs[keep]] = 1
    return out


def draw_bbox_edges(ax, corners_2d: np.ndarray, color: str = "g") -> None:
    """Draw the 12 edges of a projected 3D box on a matplotlib axis."""
    for a, b in _BOX_EDGES:
        ax.plot([corners_2d[a, 0], corners_2d[b, 0]],
                [corners_2d[a, 1], corners_2d[b, 1]], color=color,
                linewidth=1.5)


def visualize_bounding_box(rgb: np.ndarray, corners_pred: np.ndarray,
                           corners_targets: Optional[np.ndarray] = None,
                           save_path: Optional[str] = None):
    """Projected 3D bbox overlay (ref draw_utils.py:9-46).

    Args:
      rgb: [h, w, 3] uint8; corners_pred/targets: [8, 2].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(rgb)
    draw_bbox_edges(ax, corners_pred, "b")
    if corners_targets is not None:
        draw_bbox_edges(ax, corners_targets, "g")
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def visualize_mask(mask: np.ndarray, save_path: Optional[str] = None):
    """Binary/label mask display (ref draw_utils.py:48-66)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    ax.imshow(colorize_segmentation(mask[None])[0])
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def visualize_hypothesis(rgb: np.ndarray, hyp_pts: np.ndarray,
                         hyp_counts: np.ndarray,
                         keypoints: Optional[np.ndarray] = None,
                         save_path: Optional[str] = None):
    """Hypothesis scatter colored by inlier count (ref draw_utils.py:139-174).

    Args:
      hyp_pts: [hn, vn, 2]; hyp_counts: [hn, vn].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    h, w = rgb.shape[:2]
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(rgb)
    pts = hyp_pts.reshape(-1, 2)
    cts = hyp_counts.reshape(-1).astype(np.float64)
    inside = ((pts[:, 0] >= 0) & (pts[:, 0] < w)
              & (pts[:, 1] >= 0) & (pts[:, 1] < h))
    ax.scatter(pts[inside, 0], pts[inside, 1], c=cts[inside], s=2,
               cmap="viridis")
    if keypoints is not None:
        ax.scatter(keypoints[:, 0], keypoints[:, 1], c="r", marker="x", s=40)
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def visualize_voting_ellipse(rgb: np.ndarray, mean: np.ndarray,
                             cov: np.ndarray,
                             keypoints_gt: Optional[np.ndarray] = None,
                             n_std: float = 3.0,
                             save_path: Optional[str] = None):
    """Covariance ellipses around voted keypoints (ref draw_utils.py:176-205).

    Args:
      mean: [vn, 2]; cov: [vn, 2, 2].
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.patches import Ellipse
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(rgb)
    for vi in range(mean.shape[0]):
        lam, vec = np.linalg.eigh(cov[vi])
        lam = np.maximum(lam, 0)
        ang = np.degrees(np.arctan2(vec[1, 1], vec[0, 1]))
        e = Ellipse(mean[vi], 2 * n_std * np.sqrt(lam[1]),
                    2 * n_std * np.sqrt(lam[0]), angle=ang,
                    edgecolor="b", facecolor="none", linewidth=1.0)
        ax.add_patch(e)
        ax.scatter(*mean[vi], c="b", s=8)
    if keypoints_gt is not None:
        ax.scatter(keypoints_gt[:, 0], keypoints_gt[:, 1], c="g", marker="x",
                   s=40)
    ax.axis("off")
    if save_path:
        fig.savefig(save_path, bbox_inches="tight", dpi=120)
        plt.close(fig)
        return save_path
    return fig


def pts_to_img_pts(pts: np.ndarray, R: np.ndarray, T: np.ndarray,
                   K: np.ndarray):
    """Project camera/world points; returns (pixels [n, 2], depths [n])
    (ref draw_utils.py:338-342)."""
    cam = pts @ R.T + T[None, :]
    img = cam @ K.T
    return img[:, :2] / img[:, 2:], img[:, 2]


def img_pts_to_pts_img_colors(img: np.ndarray, img_pts: np.ndarray,
                              rgbs: np.ndarray) -> np.ndarray:
    """Splat per-point colors into a copy of ``img``
    (ref draw_utils.py:325-336)."""
    out = img.copy()
    h, w = img.shape[:2]
    xs = np.clip(np.round(img_pts[:, 0]).astype(np.int64), 0, w - 1)
    ys = np.clip(np.round(img_pts[:, 1]).astype(np.int64), 0, h - 1)
    out[ys, xs] = rgbs
    return out


def write_points(filename: str, pts: np.ndarray,
                 colors: Optional[np.ndarray] = None) -> None:
    """Write an xyz[rgb] text point file (ref draw_utils.py:297-311);
    produces the farthest{N}.txt keypoint files (ref data_utils.py:145-152).
    """
    pts = np.asarray(pts)
    has_color = pts.shape[1] >= 6
    with open(filename, "w") as f:
        for i, pt in enumerate(pts):
            if colors is not None:
                c = colors[i] if colors.shape[0] == pts.shape[0] else colors
                f.write(f"{pt[0]} {pt[1]} {pt[2]} "
                        f"{int(c[0])} {int(c[1])} {int(c[2])}\n")
            elif has_color:
                f.write(f"{pt[0]} {pt[1]} {pt[2]} "
                        f"{int(pt[3])} {int(pt[4])} {int(pt[5])}\n")
            else:
                f.write(f"{pt[0]} {pt[1]} {pt[2]}\n")


def visualize_points(rgb: np.ndarray, pts_target: np.ndarray,
                     pts_pred: Optional[np.ndarray] = None,
                     save_path: Optional[str] = None):
    """2D keypoint scatter overlay, one figure per batch element
    (ref draw_utils.py:235-260). rgb [b, h, w, 3] uint8 NHWC;
    pts [b, pn, 2]. With save_path, it is formatted with the batch index."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rgb = rgb.astype(np.uint8)
    outs = []
    for bi in range(pts_target.shape[0]):
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(rgb[bi])
        ax.plot(pts_target[bi, :, 0], pts_target[bi, :, 1], "g*")
        if pts_pred is not None:
            ax.plot(pts_pred[bi, :, 0], pts_pred[bi, :, 1], "b*")
        ax.axis("off")
        if save_path:
            fig.savefig(save_path.format(bi), bbox_inches="tight", dpi=120)
            plt.close(fig)
            outs.append(save_path.format(bi))
        else:
            outs.append(fig)
    return outs


def visualize_keypoints(rgb: np.ndarray, pts_target: np.ndarray,
                        pts_pred: Optional[np.ndarray] = None,
                        save_path: Optional[str] = None):
    """Like visualize_points but colors points by keypoint index so
    correspondences are visible (ref draw_utils.py:262-277)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    rgb = rgb.astype(np.uint8)
    outs = []
    idx = np.arange(pts_target.shape[1])
    for bi in range(pts_target.shape[0]):
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(rgb[bi])
        ax.scatter(pts_target[bi, :, 0], pts_target[bi, :, 1], c=idx,
                   marker="o")
        if pts_pred is not None:
            ax.scatter(pts_pred[bi, :, 0], pts_pred[bi, :, 1], c=idx,
                       marker="x")
        ax.axis("off")
        if save_path:
            fig.savefig(save_path.format(bi), bbox_inches="tight", dpi=120)
            plt.close(fig)
            outs.append(save_path.format(bi))
        else:
            outs.append(fig)
    return outs


def visualize_overlap_mask(img: np.ndarray, mask: np.ndarray,
                           save_path: Optional[str] = None) -> np.ndarray:
    """Tint masked pixels green, in place per the reference
    (ref draw_utils.py:68-73). img [b, h, w, 3] uint8; mask [b, h, w].
    Returns the tinted batch; with save_path ('{}'-formatted) writes PNGs."""
    img = img.copy()
    sel = mask > 0
    img[sel] = img[sel] // 2 + np.array([0, 128, 0], np.uint8)
    if save_path:
        from PIL import Image
        for bi in range(img.shape[0]):
            Image.fromarray(img[bi]).save(save_path.format(bi))
    return img


def visualize_mask_multi_class(mask_pred: np.ndarray, mask_gt: np.ndarray,
                               colors: Optional[np.ndarray] = None,
                               save_path: Optional[str] = None):
    """Side-by-side pred/GT label masks under a shared palette
    (ref draw_utils.py:110-137)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    palette = _COLORS if colors is None else np.asarray(colors, np.uint8)
    outs = []
    for bi in range(mask_pred.shape[0]):
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(12, 5))
        ax1.imshow(palette[np.clip(mask_pred[bi], 0, len(palette) - 1)])
        ax1.set_title("pred")
        ax2.imshow(palette[np.clip(mask_gt[bi], 0, len(palette) - 1)])
        ax2.set_title("gt")
        for ax in (ax1, ax2):
            ax.axis("off")
        if save_path:
            fig.savefig(save_path.format(bi), bbox_inches="tight", dpi=120)
            plt.close(fig)
            outs.append(save_path.format(bi))
        else:
            outs.append(fig)
    return outs


def visualize_vanishing_points(rgb: np.ndarray, van_cens: np.ndarray,
                               save_path: Optional[str] = None):
    """Arrows from the object center toward its 3 vanishing points
    (ref draw_utils.py:209-233). van_cens [b, 4, 3]: rows 0-2 homogeneous
    vanishing points, row 3 the center."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib import patches
    cen = van_cens[:, 3, :].copy()
    cen /= cen[:, 2:]
    outs = []
    for bi in range(rgb.shape[0]):
        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(rgb[bi].astype(np.uint8))
        for di, color in zip(range(3), "rgb"):
            d = (van_cens[bi, di, :] - cen[bi] * van_cens[bi, di, 2])[:2]
            d = d / (np.linalg.norm(d) + 1e-12) * 20
            ax.add_patch(patches.Arrow(x=cen[bi, 0], y=cen[bi, 1],
                                       dx=d[0], dy=d[1], linewidth=2,
                                       edgecolor=color))
        ax.axis("off")
        if save_path:
            fig.savefig(save_path.format(bi), bbox_inches="tight", dpi=120)
            plt.close(fig)
            outs.append(save_path.format(bi))
        else:
            outs.append(fig)
    return outs


def visualize_points_3d(pts1: np.ndarray, pts2: np.ndarray, K: np.ndarray,
                        h: int = 480, w: int = 640):
    """Two-view point-cloud overlap images: green = both, yellow = pred
    only, red = target only (ref draw_utils.py:75-107). The second view is
    the cloud rotated 90 degrees about its centroid."""
    def _pts_img(pts, R, T):
        img_pts, _ = pts_to_img_pts(pts, np.identity(3), np.zeros(3), K)
        a = img_pts_to_pts_img(img_pts, h, w)
        trans = (pts - T) @ R.T + T
        t_pts, _ = pts_to_img_pts(trans, np.identity(3), np.zeros(3), K)
        return a, img_pts_to_pts_img(t_pts, h, w)

    def _overlay(a, b):
        img = np.zeros([h, w, 3], np.uint8)
        img[(a > 0) & (b > 0)] = (0, 255, 0)
        img[(a > 0) & (b == 0)] = (255, 255, 0)
        img[(a == 0) & (b > 0)] = (255, 0, 0)
        return img

    T = np.mean(np.concatenate([pts1, pts2], 0), 0)[None, :]
    # rotate 90deg about the y axis through the centroid
    R = np.array([[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [-1.0, 0.0, 0.0]])
    a1, t1 = _pts_img(pts1, R, T)
    a2, t2 = _pts_img(pts2, R, T)
    return _overlay(a1, a2), _overlay(t1, t2)
