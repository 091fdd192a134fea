"""Single-image pose demo (ref tools/demo.py).

Runs the cat demo on the reference demo data: image -> (FCN or GT-derived
fields) -> RANSAC voting -> PnP -> projected 3D bbox overlay saved to
``demo_out.png``.

Without a trained checkpoint (the reference ships cat_demo/199.pth which is
not in this snapshot), ``--gt-field`` builds the vertex field from the GT
mask + pose exactly like the reference's read_data/compute_vertex
(ref demo.py:58-87) and exercises the full voting + PnP + drawing path.
With ``--checkpoint DIR`` the trained FCN provides the fields.
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
                   help="orbax model dir (per-class)")
    p.add_argument("--gt-field", action="store_true", default=None,
                   help="derive fields from GT mask+pose (default when no "
                        "checkpoint)")
    p.add_argument("--hyp_num", type=int, default=512)
    p.add_argument("--output", default="demo_out.png")
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
    from pvnet_tpu.ops.voting import ransac_voting_v3
    from pvnet_tpu.utils.viz import visualize_bounding_box

    demo = args.demo_dir
    rgb = np.array(Image.open(os.path.join(demo, "cat.jpg")))
    mask_gt = np.array(Image.open(os.path.join(demo, "cat_mask.png"))
                       .convert("1")).astype(np.int32)
    pose_gt = np.load(os.path.join(demo, "cat_pose.npy")).astype(np.float32)
    pts3d = np.loadtxt(os.path.join(demo, "cat_points_3d.txt")).astype(
        np.float32)
    bb8 = np.loadtxt(os.path.join(demo, "cat_bb8_3d.txt")).astype(
        np.float32)

    use_gt = args.gt_field or args.checkpoint is None
    key = jax.random.PRNGKey(0)

    if use_gt:
        # (ref demo.py:58-72 compute_vertex from GT)
        cam = pts3d @ pose_gt[:, :3].T + pose_gt[:, 3]
        uv = cam @ LINEMOD_K.T
        gt2d = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
        ys, xs = np.nonzero(mask_gt)
        pix = np.stack([xs, ys], -1).astype(np.float32)
        vec = gt2d[None] - pix[:, None]
        vec = vec / (np.linalg.norm(vec, axis=-1, keepdims=True) + 1e-9)
        vertex = np.zeros(mask_gt.shape + (9, 2), np.float32)
        vertex[ys, xs] = vec
        mask, vertex = jnp.asarray(mask_gt)[None], jnp.asarray(vertex)[None]
    else:
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

    @jax.jit
    def vote_and_solve(mask, vertex, key):
        kps = ransac_voting_v3(mask, vertex, key, hyp_num=args.hyp_num,
                               max_num=1024)
        pose = pl_mod.poses_from_keypoints(
            jnp.asarray(pts3d), kps, jnp.asarray(LINEMOD_K))
        return kps, pose

    kps, poses = vote_and_solve(mask, vertex, key)
    pose_pred = poses[0]

    corners_pred = np.asarray(geo.project(
        jnp.asarray(bb8), pose_pred, jnp.asarray(LINEMOD_K)))
    corners_gt = np.asarray(geo.project(
        jnp.asarray(bb8), jnp.asarray(pose_gt), jnp.asarray(LINEMOD_K)))

    ang = float(geo.rotation_angle_deg(pose_pred[:, :3],
                                       jnp.asarray(pose_gt[:, :3])))
    trans = float(jnp.linalg.norm(pose_pred[:, 3]
                                  - jnp.asarray(pose_gt[:, 3]))) * 100
    corner_px = float(np.linalg.norm(corners_pred - corners_gt,
                                     axis=-1).mean())
    print(f"pose error: {ang:.3f} deg, {trans:.3f} cm, "
          f"bb8 corner error {corner_px:.1f} px")
    out = visualize_bounding_box(rgb, corners_pred, corners_gt,
                                 save_path=args.output)
    print(f"wrote {out} (blue = predicted, green = ground truth)")


if __name__ == "__main__":
    main()
