"""Export the fused image->pose pipeline as a serialized, servable
artifact (StableHLO via jax.export) — weights baked in, no model code
needed at serving time.

The reference has no serving story (research checkpoints + python loops);
this gives pvnet-tpu a deployment path: one artifact per (object class,
input shape), loadable in any JAX process with three lines:

    from jax import export
    fn = export.deserialize(open("pipeline.jaxexport", "rb").read())
    pose, kps = fn.call(images, seed)        # [b,3,4], [b,vn,2]

Usage:
  # export (random init if no checkpoint; real use passes --checkpoint)
  python tools/export.py --out_dir export_out \
      [--checkpoint DIR] [--points_3d FILE] [--batch 8] [--uncertainty]

  # validate: load the artifact and run a smoke inference
  python tools/export.py --load export_out
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_exported(model, variables, points_3d, K, batch, height, width,
                   uncertainty=False, vote_params=None, fused_tail=False,
                   tail_depth=1, tail_quant=False, raw_uint8=False):
    """Export f(images [b,h,w,3] f32, seed i32) -> (pose, kps)."""
    import jax
    import jax.numpy as jnp
    from jax import export as jexport
    from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline

    run = make_pose_pipeline(model.apply, points_3d, K,
                             params=vote_params or VoteParams(),
                             uncertainty=uncertainty,
                             fused_tail=fused_tail,
                             tail_depth=tail_depth,
                             tail_dtype=model.dtype,
                             tail_quant=tail_quant,
                             raw_uint8=raw_uint8)

    def serve(images, seed):
        key = jax.random.PRNGKey(seed)
        return run(variables, images, key)

    spec_img = jax.ShapeDtypeStruct(
        (batch, height, width, 3),
        jnp.uint8 if raw_uint8 else jnp.float32)
    spec_seed = jax.ShapeDtypeStruct((), jnp.int32)
    return jexport.export(jax.jit(serve))(spec_img, spec_seed)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="export_out")
    ap.add_argument("--load", default=None,
                    help="load an exported dir and run a smoke inference")
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--points_3d", default=None,
                    help="txt file of [vn, 3] keypoints (defaults to the "
                         "demo cat keypoints)")
    ap.add_argument("--network", default="resnet18_8s")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--uncertainty", action="store_true")
    ap.add_argument("--fused_tail", action="store_true", default=True,
                    help="export the packed-lattice tail path "
                         "(ops/packed_tail.py; fastest measured, default)")
    ap.add_argument("--no-fused_tail", dest="fused_tail",
                    action="store_false")
    ap.add_argument("--tail_depth", type=int, default=3,
                    choices=(1, 2, 3),
                    help="packed decoder depth with --fused_tail")
    ap.add_argument("--no-bf16", dest="bf16", action="store_false",
                    default=True)
    ap.add_argument("--packed_stem", action="store_true", default=False,
                    help="artifact takes raw uint8 images; pack+normalize "
                         "+ the folded packed stem run inside the program")
    ap.add_argument("--quant", action="store_true", default=False,
                    help="bake int8 PTQ backbone stages into the "
                         "artifact (ops/quant_conv.py; the production "
                         "static whole-backbone config measured 773-778 "
                         "vs 649 poses/s e2e, metrics within noise)")
    ap.add_argument("--quant_stages", default="0,1,2,3",
                    help="comma-separated backbone stage indices to "
                         "quantize with --quant (default: whole backbone "
                         "— the bench/production default)")
    ap.add_argument("--quant_mode", default="static",
                    choices=("dynamic", "static"),
                    help="with --quant: activation-scale scheme; 'static' "
                         "(default, the production config) calibrates "
                         "scalar scales on one rendered synthetic batch "
                         "and bakes them into the artifact (measured "
                         "faster e2e than dynamic: 769 vs 738 poses/s "
                         "b128)")
    ap.add_argument("--quant_tail", action="store_true", default=False,
                    help="with --quant: int8 the packed-tail stage convs "
                         "(ops/packed_tail.run_packed_stage(quant=True); "
                         "dynamic per-image scales only — REFUTED e2e, "
                         "513 vs 738 poses/s, kept as a tested option)")
    ap.add_argument("--quant_decoder", action="store_true", default=False,
                    help="with --quant: int8 the decoder fc/8s convs "
                         "(models/pvnet.py quant_decoder)")
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    if args.load:
        with open(os.path.join(args.load, "pipeline.jaxexport"), "rb") as f:
            fn = jexport.deserialize(f.read())
        with open(os.path.join(args.load, "manifest.json")) as f:
            man = json.load(f)
        b, h, w = man["batch"], man["height"], man["width"]
        imgs = jnp.zeros((b, h, w, 3),
                         jnp.uint8 if man.get("input_dtype") == "uint8"
                         else jnp.float32)
        pose, kps = fn.call(imgs, jnp.int32(0))
        print(f"loaded {args.load}: pose {pose.shape} kps {kps.shape} "
              f"finite={bool(np.isfinite(np.asarray(pose)).all())}")
        return 0

    from pvnet_tpu.config import LINEMOD_K
    from pvnet_tpu.models.pvnet import build_model

    pts_file = args.points_3d or "/root/reference/data/demo/cat_points_3d.txt"
    points_3d = np.loadtxt(pts_file).astype(np.float32)
    vn = points_3d.shape[0]

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    qs = tuple(
        int(s) for s in args.quant_stages.split(",")) if args.quant else ()
    qd = bool(args.quant and args.quant_decoder)
    qd_kw = {"quant_decoder": True} if qd else {}   # PVNet-family only
    if args.quant:
        qd_kw["quant_mode"] = args.quant_mode
    model = build_model(args.network, ver_dim=2 * vn, seg_dim=2, dtype=dtype,
                       head_layout="NCHW", quant_stages=qs, **qd_kw)
    export_model = model if not args.packed_stem else build_model(
        args.network, ver_dim=2 * vn, seg_dim=2, dtype=dtype,
        head_layout="NCHW", stem="packed4", quant_stages=qs, **qd_kw)
    if args.checkpoint:
        from pvnet_tpu.train import trainer as trainer_mod
        from pvnet_tpu.train.checkpoint import load_net
        from pvnet_tpu.config import TrainConfig
        cfg = TrainConfig()
        state = trainer_mod.create_train_state(
            model, cfg, (1, args.height, args.width, 3),
            jax.random.PRNGKey(0))
        state, epoch = load_net(state, args.checkpoint)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        src = f"{args.checkpoint}@{epoch}"
    else:
        variables = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, args.height, args.width, 3)), train=False)
        src = "random-init"

    if args.packed_stem:
        from pvnet_tpu.models.resnet import fold_stem_params
        variables = fold_stem_params(variables)
    if args.quant and args.quant_mode == "static":
        # calibrate scalar activation scales on one rendered synthetic
        # batch (same realism envelope as bench.py) and bake the 'quant'
        # collection into the exported weights
        from pvnet_tpu.ops import quant_conv
        from pvnet_tpu import pipeline as _pl
        from bench import build_inputs
        calib_model = export_model.clone(quant_mode="calibrate")
        calib_in = build_inputs(8, args.height, args.width,
                                uint8=args.packed_stem)
        if args.packed_stem:
            calib_in = jax.jit(_pl.normalize_packed_u8)(calib_in)
        quant = quant_conv.calibrate(calib_model, variables, [calib_in],
                                     train=False)
        variables = dict(variables)
        variables["quant"] = jax.device_put(quant)
    exp = build_exported(export_model, variables, points_3d, LINEMOD_K,
                         args.batch, args.height, args.width,
                         uncertainty=args.uncertainty,
                         fused_tail=args.fused_tail,
                         tail_depth=args.tail_depth,
                         tail_quant=bool(args.quant and args.quant_tail),
                         raw_uint8=args.packed_stem)
    os.makedirs(args.out_dir, exist_ok=True)
    blob = exp.serialize()
    with open(os.path.join(args.out_dir, "pipeline.jaxexport"), "wb") as f:
        f.write(blob)
    manifest = {
        "batch": args.batch, "height": args.height, "width": args.width,
        "network": args.network, "vn": vn, "uncertainty": args.uncertainty,
        "fused_tail": args.fused_tail,
        "tail_depth": args.tail_depth,
        "quant": args.quant,
        "quant_stages": list(qs),
        "quant_mode": args.quant_mode if args.quant else None,
        "quant_tail": bool(args.quant and args.quant_tail),
        "quant_decoder": qd,
        "platforms": list(exp.platforms), "weights": src,
        "input_dtype": "uint8" if args.packed_stem else "float32",
        "points_3d": points_3d.tolist(),
        "call": "fn.call(images [b,h,w,3] "
                + ("u8 raw" if args.packed_stem else "f32 normalized")
                + ", seed i32) -> (pose [b,3,4], keypoints [b,vn,2])",
    }
    with open(os.path.join(args.out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    print(f"exported {len(blob)/1e6:.1f} MB artifact for "
          f"{exp.platforms} to {args.out_dir} (weights: {src})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
