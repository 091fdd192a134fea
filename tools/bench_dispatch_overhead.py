"""Cross-check timing methodologies on the SAME pipeline.

BENCH r3 showed uncertainty_poses_per_sec (timed with the chained-scan
harness) 2x the plain headline (timed with a python dispatch loop) — an
impossible ordering if both measure on-device compute. This probe times
the IDENTICAL plain fused pipeline both ways:

  loop:  python for-loop of jitted dispatches, fold_in key per iter,
         block at the end (bench.py's headline method since r1)
  scan:  one program, lax.scan of the same computation with a
         perturbable float-accumulator carry (benchlib.timeit_chained)

If scan >> loop, the delta is per-dispatch host/tunnel overhead that does
not pipeline, and the headline number is tunnel-bound, not chip-bound.
"""
from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--uncertainty", action="store_true")
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from bench import build_inputs, load_weights, CKPT_PATH
    from pvnet_tpu.config import LINEMOD_K
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline
    from pvnet_tpu.utils.benchlib import timeit_chained

    model = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                        dtype=jnp.bfloat16, head_layout="NCHW")
    image = build_inputs(args.batch, 480, 640)
    variables, kind = load_weights(model, image, CKPT_PATH)
    points_3d = np.loadtxt(
        "/root/reference/data/demo/cat_points_3d.txt").astype(np.float32)
    run = jax.jit(make_pose_pipeline(
        model.apply, points_3d, LINEMOD_K, params=VoteParams(),
        uncertainty=args.uncertainty, fused_tail=True, tail_depth=3))

    key = jax.random.PRNGKey(1)
    for _ in range(3):
        pose, _ = run(variables, image, key)
        jax.block_until_ready(pose)

    # ---- python dispatch loop (bench.py headline method) ----
    t0 = time.perf_counter()
    for i in range(args.iters):
        key = jax.random.fold_in(key, i + 1)
        pose, _ = run(variables, image, key)
    jax.block_until_ready(pose)
    t_loop = (time.perf_counter() - t0) / args.iters

    # ---- chained scan (benchlib) ----
    # The image must data-depend on the carry or XLA's while-loop
    # invariant code motion hoists the whole FCN forward out of the loop
    # (measured: 80 ms/batch "pipeline" = fcn once + 8 votes). A dynamic
    # batch roll keeps the per-step compute identical while defeating
    # LICM; its own cost is one HBM copy (~1 ms at this size).
    b = args.batch

    def step(carry):
        img, k, acc = carry
        kk = jax.random.fold_in(k, acc.astype(jnp.int32))
        rolled = jnp.roll(img, acc.astype(jnp.int32) % b, axis=0)
        pose, _ = run(variables, rolled, kk)
        return (img, k, acc + 1.0 + pose.astype(jnp.float32).mean() * 1e-3)

    t_scan = timeit_chained(step, (image, jax.random.PRNGKey(2),
                                   jnp.float32(1.0)), args.iters)

    print(f"weights={kind} batch={args.batch} iters={args.iters} "
          f"uncertainty={args.uncertainty}")
    print(f"loop: {t_loop * 1e3:8.2f} ms/batch "
          f"({args.batch / t_loop:7.1f} poses/s)")
    print(f"scan: {t_scan * 1e3:8.2f} ms/batch "
          f"({args.batch / t_scan:7.1f} poses/s)")
    print(f"per-dispatch overhead (loop - scan): "
          f"{(t_loop - t_scan) * 1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
