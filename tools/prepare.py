"""Offline data-preparation driver (ref run.py + data_utils __main__).

  python tools/prepare.py --type fps --linemod_cls cat [--num 8]
      FPS keypoint files farthest{N}.txt (ref data_utils.py:1034-1039)
  python tools/prepare.py --type truncated
      Truncation LINEMOD benchmark (ref data_utils.py:475-518)
  python tools/prepare.py --type render --linemod_cls cat --num 100
      Blender-free synthetic render set (renders/{cls}/)
  python tools/prepare.py --type gen_mask
      Occlusion-aware masks via z-buffer compositing
      (ref run.py:6-10 -> OcclusionLineModDB.get_masks)
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--type", required=True,
                   choices=["fps", "truncated", "render", "gen_mask"])
    p.add_argument("--linemod_cls", default=None,
                   help="single class (default: all)")
    p.add_argument("--num", type=int, default=8)
    p.add_argument("--data_dir", default=None)
    args = p.parse_args()

    from pvnet_tpu.config import (LINEMOD_CLS_NAMES, OCC_LINEMOD_CLS_NAMES,
                                  PathConfig)
    paths = PathConfig(data_dir=args.data_dir) if args.data_dir \
        else PathConfig()
    cls_names = [args.linemod_cls] if args.linemod_cls \
        else LINEMOD_CLS_NAMES

    if args.type == "fps":
        from pvnet_tpu.data.linemod import LineModModelDB
        db = LineModModelDB(paths)
        for cls in cls_names:
            pts = db.compute_farthest_surface_point_3d(cls, args.num)
            print(f"{cls}: wrote {args.num} FPS keypoints "
                  f"({pts.shape})", flush=True)

    elif args.type == "truncated":
        from pvnet_tpu.data.linemod import make_truncated_linemod_dataset
        make_truncated_linemod_dataset(cls_names, paths)
        print("truncated dataset written")

    elif args.type == "render":
        from pvnet_tpu.data.linemod import LineModImageDB
        from pvnet_tpu.data.render import DataStatistics, PythonRenderer
        from pvnet_tpu.data.synthetic import sample_object_pose
        import numpy as np
        for cls in cls_names:
            db = LineModImageDB(cls, has_render_set=False,
                                has_fuse_set=False, paths=paths)
            renderer = PythonRenderer(cls, paths)
            rng = np.random.RandomState(0)
            if db.train_real_set:
                stats = DataStatistics(
                    [r["RT"] for r in db.train_real_set])
                # KDE-sampled eulers drive uniform-ish pose coverage
                poses = [sample_object_pose(rng)
                         for _ in range(args.num)]
            else:
                poses = [sample_object_pose(rng)
                         for _ in range(args.num)]
            out = renderer.run(poses)
            print(f"{cls}: rendered {args.num} views -> {out}", flush=True)

    elif args.type == "gen_mask":
        from pvnet_tpu.data.linemod import OcclusionLineModImageDB
        from pvnet_tpu.data.render import generate_occlusion_masks
        from PIL import Image
        recs = {}
        for cls in OCC_LINEMOD_CLS_NAMES:
            db = OcclusionLineModImageDB(cls, paths=paths)
            if db.real_set:
                recs[cls] = db.real_set
        if not recs:
            print("no occlusion records found", file=sys.stderr)
            sys.exit(1)
        out_root = os.path.join(paths.occlusion_linemod_dir, "masks_gen")
        for idx, masks in generate_occlusion_masks(list(recs), recs,
                                                   paths=paths):
            for cls, m in masks.items():
                d = os.path.join(out_root, cls)
                os.makedirs(d, exist_ok=True)
                Image.fromarray(m * 255).save(
                    os.path.join(d, f"{idx}.png"))
            if idx % 100 == 0:
                print(f"image {idx}", flush=True)


if __name__ == "__main__":
    main()
