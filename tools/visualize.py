"""Visualization gallery CLI — the framework's `visualization.ipynb`.

The reference README points at a `visualization.ipynb` that is absent from
its snapshot (ref README.md:116, SURVEY.md §2.8). This CLI provides that
capability as a script: it runs the pose pipeline on the demo data (GT
fields, or a trained checkpoint) and writes every overlay the reference's
draw_utils supports:

  bbox.png        projected 3D bounding box, pred (blue) vs GT (green)
  mask.png        segmentation mask
  overlap.png     mask tinted over the image
  hypotheses.png  RANSAC hypothesis scatter colored by inlier count
  ellipses.png    keypoint covariance ellipses (uncertainty path)
  keypoints.png   voted keypoints vs GT, colored by keypoint index

  python tools/visualize.py --out_dir viz_out
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--demo_dir", default="/root/reference/data/demo")
    p.add_argument("--checkpoint", default=None,
                   help="orbax model dir; GT fields when omitted")
    p.add_argument("--hyp_num", type=int, default=512)
    p.add_argument("--out_dir", default="viz_out")
    args = p.parse_args()

    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pvnet_tpu.config import LINEMOD_K, IMAGENET_MEAN, IMAGENET_STD
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.ops import geometry as geo
    from pvnet_tpu.ops import voting
    from pvnet_tpu.utils import viz

    os.makedirs(args.out_dir, exist_ok=True)
    demo = args.demo_dir
    rgb = np.array(Image.open(os.path.join(demo, "cat.jpg")))
    mask_gt = np.array(Image.open(os.path.join(demo, "cat_mask.png"))
                       .convert("1")).astype(np.int32)
    pose_gt = np.load(os.path.join(demo, "cat_pose.npy")).astype(np.float32)
    pts3d = np.loadtxt(os.path.join(demo, "cat_points_3d.txt")).astype(
        np.float32)
    bb8 = np.loadtxt(os.path.join(demo, "cat_bb8_3d.txt")).astype(np.float32)

    cam = pts3d @ pose_gt[:, :3].T + pose_gt[:, 3]
    uv = cam @ LINEMOD_K.T
    gt2d = (uv[:, :2] / uv[:, 2:]).astype(np.float32)

    if args.checkpoint:
        from pvnet_tpu.config import TrainConfig
        from pvnet_tpu.models.pvnet import build_model
        from pvnet_tpu.train import trainer as trainer_mod
        from pvnet_tpu.train.checkpoint import load_model
        cfg = TrainConfig()
        model = build_model(cfg.network, ver_dim=18, seg_dim=2)
        state = trainer_mod.create_train_state(
            model, cfg, (1, 480, 640, 3), jax.random.PRNGKey(0))
        state, _ = load_model(state, args.checkpoint)
        img = (rgb.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        mask, vertex = pl_mod.predict_fields(
            model.apply, variables, jnp.asarray(img)[None])
    else:
        ys, xs = np.nonzero(mask_gt)
        pix = np.stack([xs, ys], -1).astype(np.float32)
        vec = gt2d[None] - pix[:, None]
        vec = vec / (np.linalg.norm(vec, axis=-1, keepdims=True) + 1e-9)
        vertex_np = np.zeros(mask_gt.shape + (9, 2), np.float32)
        vertex_np[ys, xs] = vec
        mask = jnp.asarray(mask_gt)[None]
        vertex = jnp.asarray(vertex_np)[None]

    key = jax.random.PRNGKey(0)

    @jax.jit
    def run(mask, vertex, key):
        k1, k2, k3 = jax.random.split(key, 3)
        hyps, counts = voting.generate_hypotheses_with_counts(
            mask, vertex, k1, hyp_num=args.hyp_num, max_num=1024)
        kps = voting.ransac_voting_v3(mask, vertex, k2,
                                      hyp_num=args.hyp_num, max_num=1024)
        mean, cov = voting.estimate_voting_distribution_with_mean(
            mask, vertex, kps, k3, max_num=1024)
        pose = pl_mod.poses_from_keypoints(
            jnp.asarray(pts3d), mean, jnp.asarray(LINEMOD_K), covar=cov)
        return hyps, counts, kps, mean, cov, pose

    hyps, counts, kps, mean, cov, poses = run(mask, vertex, key)
    pose_pred = poses[0]

    corners_pred = np.asarray(geo.project(
        jnp.asarray(bb8), pose_pred, jnp.asarray(LINEMOD_K)))
    corners_gt = np.asarray(geo.project(
        jnp.asarray(bb8), jnp.asarray(pose_gt), jnp.asarray(LINEMOD_K)))

    o = args.out_dir
    viz.visualize_bounding_box(rgb, corners_pred, corners_gt,
                               save_path=os.path.join(o, "bbox.png"))
    viz.visualize_mask(np.asarray(mask[0]),
                       save_path=os.path.join(o, "mask.png"))
    viz.visualize_overlap_mask(rgb[None], np.asarray(mask),
                               save_path=os.path.join(o, "overlap_{}.png"))
    viz.visualize_hypothesis(rgb, np.asarray(hyps[0]), np.asarray(counts[0]),
                             gt2d,
                             save_path=os.path.join(o, "hypotheses.png"))
    viz.visualize_voting_ellipse(rgb, np.asarray(mean[0]),
                                 np.asarray(cov[0]), gt2d,
                                 save_path=os.path.join(o, "ellipses.png"))
    viz.visualize_keypoints(rgb[None], gt2d[None], np.asarray(kps),
                            save_path=os.path.join(o, "keypoints_{}.png"))

    ang = float(geo.rotation_angle_deg(pose_pred[:, :3],
                                       jnp.asarray(pose_gt[:, :3])))
    trans = float(jnp.linalg.norm(pose_pred[:, 3]
                                  - jnp.asarray(pose_gt[:, 3]))) * 100
    print(f"pose error: {ang:.3f} deg, {trans:.3f} cm")
    print(f"wrote gallery to {o}/: bbox, mask, overlap, hypotheses, "
          f"ellipses, keypoints")


if __name__ == "__main__":
    main()
