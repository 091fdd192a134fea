"""Voting-envelope sensitivity study on a trained checkpoint.

Round-1 review flagged that the default VoteParams (512 hypotheses /
512-pixel budget) was justified only on a 200-image synthetic study with a
small object; this re-runs the sweep on real predicted masks from a trained
checkpoint over the full test split and prints proj/ADD/5cm5deg per
envelope so pipeline.VoteParams' doc can cite it.

  python tools/envelope_study.py --cfg_file configs/synthetic_train.json \
      --data_dir data/synthetic_occ --cls duck \
      --envelopes 128,256,512,1024,2048
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg_file", default="configs/synthetic_train.json")
    ap.add_argument("--data_dir", default="data/synthetic_occ")
    ap.add_argument("--cls", default="duck")
    ap.add_argument("--envelopes", default="128,256,512,1024",
                    help="comma list of hyp_num=max_num settings")
    ap.add_argument("--uncertainty", action="store_true",
                    help="evaluate through the uncertainty-PnP path "
                         "(covariance-weighted solver)")
    ap.add_argument("--unc_hyp_nums", default=None,
                    help="comma list of uncertainty_hyp_num values to "
                         "sweep (implies --uncertainty; hyp_num/max_num "
                         "stay at the first --envelopes entry). The "
                         "reference sizes this at 4096 only because its "
                         "CUDA buffers were 256-round-shaped (ref "
                         "ransac_voting_gpu.py:333)")
    ap.add_argument("--num_threads", type=int, default=4)
    ap.add_argument("--quant", action="store_true",
                    help="int8 PTQ on backbone layer3/layer4 "
                         "(ops/quant_conv.py) — measures the trained-ckpt "
                         "metric delta of the quantized inference path")
    ap.add_argument("--quant_stages", default="2,3",
                    help="comma list of backbone stages to quantize with "
                         "--quant (0,1,2,3 = whole backbone)")
    ap.add_argument("--quant_mode", default="dynamic",
                    choices=("dynamic", "static"),
                    help="activation-scale scheme with --quant; 'static' "
                         "calibrates scalar scales on the first 2 test "
                         "batches (TrainLoop.calibrate_quant)")
    ap.add_argument("--quant_decoder", action="store_true",
                    help="with --quant: int8 the decoder fc/8s convs too "
                         "(models/pvnet.py quant_decoder)")
    ap.add_argument("--quant_tail", action="store_true",
                    help="with --quant and --tail_depth>0: int8 the "
                         "packed-tail stage convs "
                         "(ops/packed_tail.run_packed_stage(quant=True))")
    ap.add_argument("--tail_depth", type=int, default=0,
                    choices=(0, 1, 2, 3),
                    help="packed decoder tail depth (0 = plain)")
    ap.add_argument("--vote_impl", default=None,
                    choices=("xla", "bf16", "pallas"),
                    help="inlier-count implementation (ops/voting."
                         "count_inliers); 'bf16' = half-precision "
                         "compare-reduce, winner selection only")
    ap.add_argument("--weights", default=None,
                    help="flax msgpack weights (e.g. "
                         "assets/duck_ckpt.msgpack) instead of an orbax "
                         "training checkpoint — the committed artifact "
                         "works on the regenerated synthetic set (same "
                         "generator seed)")
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
    enable_compilation_cache()
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.config import PathConfig, TrainConfig
    from pvnet_tpu.data.linemod import LineModImageDB
    from pvnet_tpu.eval.evaluator import Evaluator
    from pvnet_tpu.train.loop import TrainLoop

    cfg = TrainConfig.from_json(args.cfg_file)
    if args.quant:
        # param trees are identical (tests/test_quant_conv.py), so the
        # float checkpoint restores into the quantized model unchanged
        import dataclasses
        cfg = dataclasses.replace(
            cfg,
            quant_stages=tuple(int(x) for x in
                               args.quant_stages.split(",")),
            quant_decoder=args.quant_decoder,
            quant_mode=args.quant_mode)
    paths = PathConfig(data_dir=args.data_dir)
    loop = TrainLoop(cfg, args.cls, paths=paths)
    state = loop.init_state()
    if args.weights:
        import jax
        from flax import serialization
        with open(args.weights, "rb") as f:
            restored = serialization.from_bytes(
                {"params": state.params,
                 "batch_stats": state.batch_stats}, f.read())
        restored = jax.device_put(restored)
        state = state.replace(params=restored["params"],
                              batch_stats=restored["batch_stats"])
        epoch = 1
        print(f"weights from {args.weights}")
    else:
        state, epoch = loop.resume(state)
        if epoch == 0:
            print("no checkpoint — train first", file=sys.stderr)
            return 1
        print(f"checkpoint epoch {epoch - 1}")

    db = LineModImageDB(args.cls, has_render_set=False, has_fuse_set=False,
                        paths=paths)
    test_db = db.test_real_set
    loader = loop.make_val_loader(test_db, paths.linemod_dir,
                                  args.num_threads)

    if args.quant and args.quant_mode == "static":
        loop.calibrate_quant(state, loader)
        print("calibrated static int8 scales on 2 test batches")

    uncertainty = args.uncertainty or args.unc_hyp_nums is not None
    if args.unc_hyp_nums is not None:
        base = int(args.envelopes.split(",")[0])
        sweeps = [(base, int(u)) for u in args.unc_hyp_nums.split(",")]
    else:
        sweeps = [(int(x), None) for x in args.envelopes.split(",")]

    rows = []
    for n, unc_n in sweeps:
        kw = dict(hyp_num=n, max_num=n)
        if unc_n is not None:
            kw["uncertainty_hyp_num"] = unc_n
        vp = pl_mod.VoteParams(**kw)
        tag = f"env{n}" if unc_n is None else f"env{n}u{unc_n}"
        evaluator = Evaluator(loop.object_meta())
        res = loop.validate(state, loader, epoch, prefix=tag,
                            evaluate_pose=True, evaluator=evaluator,
                            uncertainty=uncertainty,
                            vote_params=vp, tail_depth=args.tail_depth,
                            tail_quant=args.quant and args.quant_tail,
                            vote_impl=args.vote_impl)
        rows.append({
            "hyp_num": n, "max_num": n,
            **({"uncertainty_hyp_num": unc_n} if unc_n is not None
               else {}),
            **({"vote_impl": args.vote_impl} if args.vote_impl else {}),
            "uncertainty": uncertainty,
            "proj": round(res[f"{tag}/scalar/projection_error"], 4),
            "add": round(res[f"{tag}/scalar/add"], 4),
            "cm5deg5": round(res[f"{tag}/scalar/cm"], 4),
        })
        print(json.dumps(rows[-1]), flush=True)

    print("\nenvelope sweep:")
    for r in rows:
        print(json.dumps(r))
    return 0


if __name__ == "__main__":
    sys.exit(main())
