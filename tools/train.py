"""Train / evaluate PVNet-TPU on LINEMOD (ref tools/train_linemod.py CLI).

Usage:
  python tools/train.py --cfg_file configs/linemod_train.json \
      --linemod_cls cat                      # train
  python tools/train.py --cfg_file ... --linemod_cls cat --test_model \
      [--use_uncertainty_pnp] [--normal] [--occluded] [--truncated]
  python tools/train.py --synthetic --epochs 3   # self-contained smoke run

Flags mirror ref lib/utils/arg_utils.py; the training recipe JSON is
compatible with ref configs/linemod_train.json.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--cfg_file", default="configs/linemod_train.json")
    p.add_argument("--linemod_cls", default="cat")
    p.add_argument("--test_model", action="store_true")
    p.add_argument("--use_test_set", action="store_true")
    p.add_argument("--use_uncertainty_pnp", action="store_true")
    p.add_argument("--tail_depth", type=int, default=3,
                   choices=(0, 1, 2, 3),
                   help="eval decoder tail: 0 plain; 1-3 packed "
                        "lattice depth (ops/packed_tail.py). Default 3 = "
                        "the repo-wide packed default (exact-math, "
                        "parity-tested, fastest measured — CLAUDE.md); "
                        "matches bench.py/infer.py/export.py")
    p.add_argument("--load_epoch", type=int, default=-1)
    p.add_argument("--normal", action="store_true", default=True)
    p.add_argument("--no-normal", dest="normal", action="store_false")
    p.add_argument("--occluded", action="store_true")
    p.add_argument("--truncated", action="store_true")
    p.add_argument("--data_dir", default=None,
                   help="override dataset root (default <repo>/data)")
    p.add_argument("--epochs", type=int, default=None,
                   help="override epoch_num for short runs")
    p.add_argument("--synthetic", action="store_true",
                   help="generate + train on a synthetic LINEMOD-layout "
                        "dataset (no real data needed)")
    p.add_argument("--synthetic_images", type=int, default=64)
    p.add_argument("--synthetic_occluder_prob", type=float, default=0.0,
                   help="probability of injecting an occluder object per "
                        "synthetic image (occlusion-LINEMOD-style data)")
    p.add_argument("--synthetic_clutter", type=int, default=0,
                   help="max fuse-style clutter objects per synthetic image")
    p.add_argument("--buckets", default="256x256,320x448,480x640",
                   help="comma-separated HxW size buckets (bounds XLA "
                        "recompilation; empty = full reference 8px grid)")
    p.add_argument("--save_inter_result", action="store_true")
    p.add_argument("--save_inter_dir", default="save_result")
    p.add_argument("--num_threads", type=int, default=4)
    p.add_argument("--imagenet_pth", default=None,
                   help="torchvision/model_zoo ImageNet .pth to initialize "
                        "the backbone from (decoder heads stay random — "
                        "the reference's standard init, ref "
                        "resnet.py:223-280). One-command conversion: the "
                        "loader consumes every tensor or fails.")
    p.add_argument("--device_aug", action="store_true",
                   help="run augmentation on device inside the jitted "
                        "train step (data.augment_device) instead of in "
                        "host threads")
    p.add_argument("--device_data", action="store_true",
                   help="keep the whole training set resident in HBM "
                        "(uint8) and gather minibatches by index on "
                        "device; implies --device_aug")
    p.add_argument("--head_layout", default=None,
                   choices=("NHWC", "NCHW"),
                   help="model head emission layout (default: recipe "
                        "value). NCHW runs the training loss channel-"
                        "major — the TPU-fast form (train/loss.py); "
                        "checkpoints interchange between layouts")
    p.add_argument("--input_layout", default=None,
                   choices=("NHWC", "NCHW"),
                   help="image layout between the device aug and conv1 "
                        "(default: recipe value). NCHW hands the image "
                        "to the model channel-major — no 42x-lane-"
                        "padded [b,h,w,3] materialization in the step "
                        "(models/resnet.Conv). Needs --device_aug; "
                        "checkpoints interchange")
    return p.parse_args()


def main():
    args = parse_args()

    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
    enable_compilation_cache()
    from pvnet_tpu.config import (OCC_LINEMOD_CLS_NAMES, PathConfig,
                                  TrainConfig)
    from pvnet_tpu.data.linemod import (LineModImageDB,
                                        OcclusionLineModImageDB,
                                        TruncatedLineModImageDB)
    from pvnet_tpu.eval.evaluator import Evaluator
    from pvnet_tpu.train.checkpoint import load_model
    from pvnet_tpu.train.loop import TrainLoop
    from pvnet_tpu.data.dataset import (ImageSizeBatchSampler, PoseDataset,
                                        Prefetcher)

    if os.path.exists(args.cfg_file):
        cfg = TrainConfig.from_json(args.cfg_file)
    else:
        cfg = TrainConfig()
    if args.epochs is not None:
        cfg.epoch_num = args.epochs
    if args.device_aug:
        cfg.device_aug = True
    if args.device_data:
        cfg.device_aug = True
        cfg.device_data = True
    if args.head_layout is not None:
        cfg.head_layout = args.head_layout
    if args.input_layout is not None:
        cfg.input_layout = args.input_layout
    # Channel-major is the measured-fast training form (228.9 vs
    # 311.95 ms/step at b16 480x640 — tools/bench_train_pieces.py):
    # auto-select it on the device-aug path unless the CLI or the recipe
    # JSON pinned a layout explicitly. Checkpoints interchange.
    if cfg.device_aug:
        _auto = []
        if args.head_layout is None and "head_layout" not in cfg.recipe_keys:
            cfg.head_layout = "NCHW"
            _auto.append("head")
        if (args.input_layout is None
                and "input_layout" not in cfg.recipe_keys):
            cfg.input_layout = "NCHW"
            _auto.append("input")
        if _auto:
            print(f"[train] auto-selected channel-major training layout "
                  f"({'+'.join(_auto)}): head={cfg.head_layout} "
                  f"input={cfg.input_layout}")
    if cfg.input_layout == "NCHW" and not cfg.device_aug:
        raise SystemExit("--input_layout NCHW requires --device_aug "
                         "(the cm image is the device aug's emission)")

    paths = PathConfig(data_dir=args.data_dir) if args.data_dir \
        else PathConfig()
    cls_name = args.linemod_cls

    if args.synthetic:
        from pvnet_tpu.data.synthetic import generate_synthetic_linemod
        occ = args.synthetic_occluder_prob > 0 or args.synthetic_clutter > 0
        synth_root = os.path.join(paths.data_dir,
                                  "synthetic_occ" if occ else "synthetic")
        marker = os.path.join(synth_root, "LINEMOD", cls_name, "train.txt")
        if not os.path.exists(marker):
            print(f"generating synthetic dataset ({args.synthetic_images} "
                  f"images, occluder_prob="
                  f"{args.synthetic_occluder_prob}, "
                  f"clutter<={args.synthetic_clutter}) ...", flush=True)
            generate_synthetic_linemod(
                synth_root, cls_name, num_images=args.synthetic_images,
                occluder_prob=args.synthetic_occluder_prob,
                max_clutter=args.synthetic_clutter)
        paths = PathConfig(data_dir=synth_root)

    buckets = None
    if args.buckets:
        try:
            buckets = [tuple(map(int, b.split("x")))
                       for b in args.buckets.split(",")]
        except ValueError:
            raise SystemExit(f"--buckets must be HxW[,HxW...], "
                             f"got {args.buckets!r}")
        if any(len(b) != 2 or b[0] <= 0 or b[1] <= 0 for b in buckets):
            raise SystemExit(f"--buckets must be HxW[,HxW...] with "
                             f"positive dims, got {args.buckets!r}")

    loop = TrainLoop(cfg, cls_name, paths=paths, buckets=buckets)

    if args.test_model:
        state = loop.init_state()
        state, epoch = load_model(state, loop.model_dir, args.load_epoch)
        prefix = "test" if args.use_test_set else "val"

        if args.normal:
            print("testing normal linemod ...", flush=True)
            db = LineModImageDB(cls_name, has_render_set=False,
                                has_fuse_set=False, paths=paths)
            test_db = db.test_real_set + db.val_real_set
            ds = PoseDataset(test_db, paths.linemod_dir, cfg.vote_type,
                             augment=False, aug_cfg=cfg.aug_cfg)
            sampler = ImageSizeBatchSampler(
                range(len(ds)), cfg.test_batch_size, aug_cfg=cfg.aug_cfg,
                shuffle=False)
            loader = Prefetcher(ds, sampler,
                                num_threads=args.num_threads)
            loop.validate(state, loader, epoch, prefix,
                          evaluate_pose=True,
                          uncertainty=args.use_uncertainty_pnp,
                          tail_depth=args.tail_depth,
                          evaluator=Evaluator(loop.object_meta()),
                          save_inter_dir=(args.save_inter_dir
                                          if args.save_inter_result
                                          else None))

        if args.occluded and cls_name in OCC_LINEMOD_CLS_NAMES:
            print("testing occluded linemod ...", flush=True)
            odb = OcclusionLineModImageDB(cls_name, paths=paths)
            ds = PoseDataset(odb.test_real_set,
                             paths.occlusion_linemod_dir, cfg.vote_type,
                             augment=False, aug_cfg=cfg.aug_cfg)
            sampler = ImageSizeBatchSampler(
                range(len(ds)), cfg.test_batch_size, aug_cfg=cfg.aug_cfg,
                shuffle=False)
            loader = Prefetcher(ds, sampler, num_threads=args.num_threads)
            loop.validate(state, loader, epoch, f"occ_{prefix}",
                          evaluate_pose=True,
                          uncertainty=args.use_uncertainty_pnp,
                          tail_depth=args.tail_depth,
                          evaluator=Evaluator(loop.object_meta()))

        if args.truncated:
            print("testing truncated linemod ...", flush=True)
            tdb = TruncatedLineModImageDB(cls_name, paths=paths)
            ds = PoseDataset(tdb.set, paths.linemod_dir, cfg.vote_type,
                             augment=False, aug_cfg=cfg.aug_cfg,
                             use_intrinsic=True)
            sampler = ImageSizeBatchSampler(
                range(len(ds)), cfg.test_batch_size, aug_cfg=cfg.aug_cfg,
                shuffle=False)
            loader = Prefetcher(ds, sampler, num_threads=args.num_threads)
            loop.validate(state, loader, epoch, "trun_test",
                          evaluate_pose=True,
                          uncertainty=args.use_uncertainty_pnp,
                          tail_depth=args.tail_depth,
                          use_camera_intrinsic=True,
                          evaluator=Evaluator(loop.object_meta()))
        return

    # ---- train (ref train_net() :305-347) ----
    db = LineModImageDB(cls_name, has_render_set=True,
                        has_fuse_set=cfg.use_fuse, paths=paths)
    train_db = []
    train_db += db.render_set
    if cfg.use_real_train:
        train_db += db.train_real_set
    if cfg.use_fuse:
        train_db += db.fuse_set
    val_db = db.val_real_set if db.val_real_set else db.test_real_set
    if not train_db:
        print("no training records found — check --data_dir or use "
              "--synthetic", file=sys.stderr)
        sys.exit(1)
    print(f"train set: {len(train_db)} images, val: {len(val_db)}",
          flush=True)
    loop.fit(train_db, val_db, paths.linemod_dir,
             num_threads=args.num_threads,
             imagenet_pth=args.imagenet_pth)


if __name__ == "__main__":
    main()
