"""Stage-wise throughput profile of the pose pipeline on the current device.

Times (a) FCN forward, (b) RANSAC voting, (c) PnP solve, and (d) the fused
pipeline, each jitted separately, to locate the bottleneck. Run on TPU.

  python tools/profile_pipeline.py [--batch 16] [--height 480] [--width 640]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(fn, args, iters=10, warmup=2):
    import jax
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--hyp_num", type=int, default=1024)
    ap.add_argument("--max_num", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false",
                    default=True)
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.config import LINEMOD_K
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.ops.voting import ransac_voting_v3

    b, h, w = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    model = build_model("resnet18_8s", ver_dim=18, dtype=dtype)
    image = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)
    pts3d = rng.uniform(-0.06, 0.06, (9, 3)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    fwd = jax.jit(lambda v, x: pl_mod.predict_fields(model.apply, v, x))
    t_fwd = timeit(fwd, (variables, image), args.iters)
    mask, vertex = fwd(variables, image)
    print(f"fcn_forward:      {t_fwd * 1e3:8.2f} ms/batch "
          f"({b / t_fwd:7.1f} img/s)")

    vote = jax.jit(lambda m, v, k: ransac_voting_v3(
        m, v, k, hyp_num=args.hyp_num, max_num=args.max_num))
    t_vote = timeit(vote, (mask, vertex, key), args.iters)
    kps = vote(mask, vertex, key)
    print(f"ransac_voting:    {t_vote * 1e3:8.2f} ms/batch "
          f"({b / t_vote:7.1f} img/s)")

    solve = jax.jit(lambda kp: pl_mod.poses_from_keypoints(
        jnp.asarray(pts3d), kp, jnp.asarray(LINEMOD_K)))
    t_pnp = timeit(solve, (kps,), args.iters)
    print(f"pnp_solve:        {t_pnp * 1e3:8.2f} ms/batch "
          f"({b / t_pnp:7.1f} img/s)")

    full = jax.jit(pl_mod.make_pose_pipeline(
        model.apply, pts3d, LINEMOD_K,
        params=pl_mod.VoteParams(hyp_num=args.hyp_num,
                                 max_num=args.max_num)))
    t_full = timeit(full, (variables, image, key), args.iters)
    print(f"fused_pipeline:   {t_full * 1e3:8.2f} ms/batch "
          f"({b / t_full:7.1f} poses/s)")
    print(f"stage_sum:        {(t_fwd + t_vote + t_pnp) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
