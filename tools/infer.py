"""Batch pose inference CLI — images in, poses out.

The serving-side entry point: loads a trained checkpoint, compiles the
fused image -> FCN -> voting -> PnP pipeline once (optionally sharded over
every available chip via the data mesh), streams image files through it in
fixed-size batches, and writes one JSON line per image:

  {"path": ..., "pose": [[r r r t], ...], "kps": [[x, y], ...],
   "fg_pixels": N}

  python tools/infer.py --checkpoint data/synthetic/model/cat_synthetic_smoke \
      --points_3d data/synthetic/LINEMOD/cat/farthest.txt \
      --images 'data/synthetic/LINEMOD/cat/JPEGImages/*.jpg' \
      --output poses.jsonl

The reference has no batch-inference tool (its eval loop is the closest,
ref tools/train_linemod.py:177-253); this is the deployment-shaped
counterpart built on make_sharded_pose_pipeline.
"""
from __future__ import annotations

import argparse
import glob as globmod
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def parse_args():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint", required=True,
                   help="orbax model dir (per-class)")
    p.add_argument("--images", required=True,
                   help="glob of input images (consistent size)")
    p.add_argument("--points_3d", required=True,
                   help="txt file of the object's K 3D keypoints "
                        "(center appended if vote_type=Farthest and the "
                        "file has 8 rows)")
    p.add_argument("--center_3d", default=None,
                   help="optional txt with the object center (1x3)")
    p.add_argument("--cfg_file", default=None,
                   help="training recipe JSON (network/vote_type)")
    p.add_argument("--K", default="linemod",
                   help="named intrinsics (linemod/blender) or a txt file")
    p.add_argument("--batch", type=int, default=16)
    p.add_argument("--uncertainty", action="store_true")
    p.add_argument("--hyp_num", type=int, default=None)
    p.add_argument("--tail_depth", type=int, default=3, choices=(0, 1, 2, 3),
                   help="0 plain decoder; 1-3 packed-lattice tail depth "
                        "(ops/packed_tail.py; needs even image dims; "
                        "3 is the fastest measured and the default)")
    p.add_argument("--packed_stem", action="store_true", default=False,
                   help="run the stem on the s2d-packed uint8 image "
                        "(conv7 checkpoint weights are folded exactly; "
                        "host-side normalization is skipped)")
    p.add_argument("--quant", action="store_true", default=False,
                   help="int8 PTQ backbone stages (ops/quant_conv.py; "
                        "same checkpoint loads unchanged; the static "
                        "whole-backbone production config measured "
                        "773-778 vs 649 poses/s e2e)")
    p.add_argument("--quant_stages", default="0,1,2,3",
                   help="comma-separated backbone stage indices to "
                        "quantize with --quant (default: whole backbone "
                        "— the bench/production default)")
    p.add_argument("--quant_mode", default="static",
                   choices=("dynamic", "static"),
                   help="with --quant: 'static' (default) calibrates "
                        "scalar activation scales on the first input "
                        "batch (faster e2e than dynamic: 769 vs 738 "
                        "poses/s)")
    p.add_argument("--quant_tail", action="store_true", default=False,
                   help="with --quant: int8 the packed-tail stage convs "
                        "(dynamic per-image scales only; REFUTED e2e)")
    p.add_argument("--quant_decoder", action="store_true", default=False,
                   help="with --quant: int8 the decoder fc/8s convs")
    p.add_argument("--output", default="poses.jsonl")
    return p.parse_args()


def main():
    args = parse_args()
    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from pvnet_tpu.config import (INTRINSIC_MATRICES, IMAGENET_MEAN,
                                  IMAGENET_STD, TrainConfig)
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.parallel import make_mesh
    from pvnet_tpu.train import trainer as trainer_mod
    from pvnet_tpu.train.checkpoint import load_net

    cfg = (TrainConfig.from_json(args.cfg_file) if args.cfg_file
           else TrainConfig())

    pts3d = np.loadtxt(args.points_3d).astype(np.float32)
    if args.center_3d:
        pts3d = np.concatenate(
            [pts3d, np.loadtxt(args.center_3d).reshape(1, 3)], 0
        ).astype(np.float32)
    vn = pts3d.shape[0]

    if os.path.exists(args.K):
        K = np.loadtxt(args.K).astype(np.float32)
    else:
        K = INTRINSIC_MATRICES[args.K].astype(np.float32)

    paths = sorted(globmod.glob(args.images))
    if not paths:
        print(f"no images match {args.images}", file=sys.stderr)
        return 1
    first = np.array(Image.open(paths[0]).convert("RGB"))
    h, w = first.shape[:2]
    print(f"{len(paths)} images at {h}x{w}; vn={vn}", flush=True)

    # quant settings come from the CLI when --quant is passed, else fall
    # back to the checkpoint recipe's config (so a recipe with
    # quant_stages + quant_mode='static' gets calibration without flags)
    if args.quant:
        qs = tuple(int(s) for s in args.quant_stages.split(","))
        quant_mode = args.quant_mode
    else:
        qs = tuple(cfg.quant_stages)
        quant_mode = cfg.quant_mode
    qd = bool(args.quant and args.quant_decoder) or cfg.quant_decoder
    qd_kw = {"quant_decoder": True} if qd else {}   # PVNet-family only
    if qs:
        qd_kw["quant_mode"] = quant_mode
    model = build_model(cfg.network, ver_dim=2 * vn, seg_dim=2,
                        dtype=jnp.bfloat16 if cfg.bf16 else jnp.float32,
                        quant_stages=qs, **qd_kw)
    state = trainer_mod.create_train_state(model, cfg, (1, h, w, 3),
                                           jax.random.PRNGKey(0))
    state, epoch = load_net(state, args.checkpoint)
    if epoch == 0:
        print(f"no checkpoint found in {args.checkpoint}", file=sys.stderr)
        return 1
    print(f"loaded epoch {epoch - 1}", flush=True)
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    if args.packed_stem:
        from pvnet_tpu.models.resnet import fold_stem_params
        model = build_model(cfg.network, ver_dim=2 * vn, seg_dim=2,
                            dtype=model.dtype, stem="packed4",
                            quant_stages=qs, **qd_kw)
        variables = fold_stem_params(variables)

    mesh = make_mesh()
    n_dev = int(mesh.devices.size)
    batch = max(args.batch // n_dev, 1) * n_dev
    params = pl_mod.VoteParams()
    if args.hyp_num:
        params = params._replace(hyp_num=args.hyp_num)
    run = pl_mod.make_sharded_pose_pipeline(
        mesh, model.apply, pts3d, K, params=params,
        uncertainty=args.uncertainty,
        fused_tail=args.tail_depth > 0, tail_depth=args.tail_depth,
        tail_dtype=model.dtype,
        tail_quant=bool(args.quant and args.quant_tail) or cfg.quant_tail,
        raw_uint8=args.packed_stem)

    def load_image(path):
        img = np.array(Image.open(path).convert("RGB"))
        if args.packed_stem:
            return img                      # uint8; device-side normalize
        return (img.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD

    if qs and quant_mode == "static":
        # calibrate scalar activation scales on the first (real) images —
        # the best calibration data available (ops/quant_conv.calibrate)
        from pvnet_tpu.ops import quant_conv
        calib_model = model.clone(quant_mode="calibrate")
        calib_in = jnp.asarray(np.stack(
            [load_image(q) for q in paths[:min(8, len(paths))]]))
        if args.packed_stem:
            calib_in = jax.jit(pl_mod.normalize_packed_u8)(calib_in)
        variables = dict(variables)
        variables["quant"] = jax.device_put(quant_conv.calibrate(
            calib_model, variables, [calib_in], train=False))
        print("calibrated static int8 scales on "
              f"{min(8, len(paths))} images", flush=True)

    # also report foreground size per image (cheap QA signal)
    if args.packed_stem:
        fwd = jax.jit(lambda v, x: pl_mod.predict_fields(
            model.apply, v, pl_mod.normalize_packed_u8(x))[0])
    else:
        fwd = jax.jit(
            lambda v, x: pl_mod.predict_fields(model.apply, v, x)[0])

    key = jax.random.PRNGKey(0)
    t0 = time.time()
    n_done = 0
    with open(args.output, "w") as out:
        for i in range(0, len(paths), batch):
            chunk = paths[i:i + batch]
            imgs = np.stack([load_image(p) for p in chunk])
            pad = batch - len(chunk)
            if pad:
                imgs = np.concatenate([imgs, np.zeros((pad, h, w, 3),
                                                      np.float32)])
            key = jax.random.fold_in(key, i)
            poses, kps = run(variables, jnp.asarray(imgs), key)
            masks = fwd(variables, jnp.asarray(imgs))
            fg = np.asarray(jnp.sum(masks.reshape(batch, -1), axis=1))
            poses, kps = np.asarray(poses), np.asarray(kps)
            for j, p in enumerate(chunk):
                out.write(json.dumps({
                    "path": p,
                    "pose": np.round(poses[j], 6).tolist(),
                    "kps": np.round(kps[j], 2).tolist(),
                    "fg_pixels": int(fg[j]),
                }) + "\n")
            n_done += len(chunk)
            print(f"\r{n_done}/{len(paths)}", end="", flush=True)
    dt = time.time() - t0
    print(f"\nwrote {args.output}: {len(paths)} poses in {dt:.1f}s "
          f"({len(paths) / dt:.1f} poses/s incl. host IO, {n_dev} chip(s))")
    return 0


if __name__ == "__main__":
    sys.exit(main())
