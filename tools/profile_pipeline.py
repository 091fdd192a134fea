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



from pvnet_tpu.utils.benchlib import timeit_chained


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
    ap.add_argument("--packed_stem", action="store_true", default=False,
                    help="stem on the s2d-packed uint8 image; the e2e "
                         "timings start from raw uint8 input")
    ap.add_argument("--tail_depth", type=int, default=0, choices=(0, 1, 2, 3),
                    help="also profile the packed-lattice pipeline at this "
                         "depth (0 = plain only)")
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import (enable_compilation_cache,
                                       pin_platform_from_env)
    pin_platform_from_env()
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
    model = build_model("resnet18_8s", ver_dim=18, dtype=dtype,
                        head_layout="NCHW",
                        stem="packed4" if args.packed_stem else "conv7")
    if args.packed_stem:
        image = jnp.asarray(rng.randint(0, 255, (b, h, w, 3)), jnp.uint8)
    else:
        image = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, h, w, 3), jnp.float32),
                           train=False)
    pts3d = rng.uniform(-0.06, 0.06, (9, 3)).astype(np.float32)
    key = jax.random.PRNGKey(1)

    if args.packed_stem:
        fwd = lambda v, x: pl_mod.predict_fields(
            model.apply, v, pl_mod.normalize_packed_u8(x))
    else:
        fwd = lambda v, x: pl_mod.predict_fields(model.apply, v, x)

    def chain_img(img, scalar):
        """Fold a data-dependent (runtime-zero) scalar into the image so
        scan steps cannot be hoisted; works for uint8 images too."""
        if img.dtype == jnp.uint8:
            return (img.astype(jnp.int32)
                    + scalar.astype(jnp.int32)).astype(jnp.uint8)
        return img + scalar.astype(img.dtype)

    def fcn_step(img):
        mask, vertex = fwd(variables, img)
        # layout-agnostic scalar carry dependence (vertex may be NHWC
        # [b,h,w,vn,2] or the channel-major [b,vn*2,h,w] emission)
        return chain_img(img, vertex.astype(jnp.float32).mean() * 1e-12)

    t_fwd = timeit_chained(fcn_step, image, args.iters)
    mask, vertex = jax.jit(fwd)(variables, image)
    print(f"fcn_forward:      {t_fwd * 1e3:8.2f} ms/batch "
          f"({b / t_fwd:7.1f} img/s)")

    def vote_step(carry):
        v, k = carry
        kps = ransac_voting_v3(mask, v, k, hyp_num=args.hyp_num,
                               max_num=args.max_num)
        v2 = v + (kps.mean() * 1e-12).astype(v.dtype)
        return (v2, jax.random.fold_in(k, 0))

    t_vote = timeit_chained(vote_step, (vertex, key), args.iters)
    kps = jax.jit(lambda m, v, k: ransac_voting_v3(
        m, v, k, hyp_num=args.hyp_num, max_num=args.max_num))(
        mask, vertex, key)
    print(f"ransac_voting:    {t_vote * 1e3:8.2f} ms/batch "
          f"({b / t_vote:7.1f} img/s)")

    def pnp_step(kp):
        poses = pl_mod.poses_from_keypoints(
            jnp.asarray(pts3d), kp, jnp.asarray(LINEMOD_K))
        return kp + poses[:, 0, 0, None, None] * 1e-12

    t_pnp = timeit_chained(pnp_step, kps, args.iters)
    print(f"pnp_solve:        {t_pnp * 1e3:8.2f} ms/batch "
          f"({b / t_pnp:7.1f} img/s)")

    full = pl_mod.make_pose_pipeline(
        model.apply, pts3d, LINEMOD_K,
        params=pl_mod.VoteParams(hyp_num=args.hyp_num,
                                 max_num=args.max_num),
        raw_uint8=args.packed_stem)

    def full_step(carry):
        img, k = carry
        pose, kp = full(variables, img, k)
        return (chain_img(img, pose[:, 0, 0].mean() * 1e-12),
                jax.random.fold_in(k, 0))

    t_full = timeit_chained(full_step, (image, key), args.iters)
    print(f"fused_pipeline:   {t_full * 1e3:8.2f} ms/batch "
          f"({b / t_full:7.1f} poses/s)")
    print(f"stage_sum:        {(t_fwd + t_vote + t_pnp) * 1e3:8.2f} ms")

    if args.tail_depth:
        packed = pl_mod.make_pose_pipeline(
            model.apply, pts3d, LINEMOD_K,
            params=pl_mod.VoteParams(hyp_num=args.hyp_num,
                                     max_num=args.max_num),
            fused_tail=True, tail_depth=args.tail_depth,
            tail_dtype=model.dtype, raw_uint8=args.packed_stem)

        def packed_step(carry):
            img, k = carry
            pose, kp = packed(variables, img, k)
            return (chain_img(img, pose[:, 0, 0].mean() * 1e-12),
                    jax.random.fold_in(k, 0))

        t_packed = timeit_chained(packed_step, (image, key), args.iters)
        print(f"packed_pipeline(d{args.tail_depth}): {t_packed * 1e3:6.2f} "
              f"ms/batch ({b / t_packed:7.1f} poses/s)")


if __name__ == "__main__":
    main()
