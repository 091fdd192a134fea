"""Bisect the fused image->pose pipeline: chained-time progressively longer
prefixes of the program to locate where time goes *in context* (stage-level
timing with constant inputs lets XLA hoist work and under-reports).

  python tools/bisect_pipeline.py [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit_chained(step_fn, carry, iters=10):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(c0):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, c0, None, length=iters)
        return out

    out = run(carry)
    jax.block_until_ready(out)
    # time with a *different* input: the async axon tunnel memoizes whole
    # repeated dispatches with identical arguments
    perturbed = jax.tree.map(
        lambda t: t * (1 + 1e-6) if jnp.issubdtype(t.dtype, jnp.floating)
        else t, carry)
    t0 = time.perf_counter()
    out = run(perturbed)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--hyp_num", type=int, default=1024)
    ap.add_argument("--max_num", type=int, default=1024)
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.config import LINEMOD_K
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.ops import voting

    b, h, w = args.batch, args.height, args.width
    rng = np.random.RandomState(0)
    model = build_model("resnet18_8s", ver_dim=18, dtype=jnp.bfloat16,
                        head_layout="NCHW")
    image = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)
    pts3d = jnp.asarray(rng.uniform(-0.06, 0.06, (9, 3)), jnp.float32)
    K = jnp.asarray(LINEMOD_K, jnp.float32)
    key0 = jax.random.PRNGKey(1)

    def chain(img, x):
        """fold a scalar of x into img to serialize iterations."""
        s = 1 + 1e-12 * x.astype(jnp.float32).mean()
        return img * s

    def prefix(upto):
        def step(carry):
            img, k = carry
            k, k1, k2 = jax.random.split(k, 3)
            mask, vertex = pl_mod.predict_fields(model.apply, variables, img)
            if upto == "fwd":
                return chain(img, vertex), k
            if upto == "mask":
                return chain(img, (mask != 0).astype(jnp.float32)), k
            if upto == "score":
                fgm = (mask != 0)
                noise = voting._fast_uniform(k1, mask.shape)
                score = fgm.astype(jnp.float32) * 2.0 + noise
                return chain(img, score), k
            fg = voting.sample_foreground(mask, vertex, args.max_num, k1)
            if upto == "select":
                return chain(img, fg.dirs), k
            kps = voting.ransac_voting_v3(
                mask, vertex, k2, hyp_num=args.hyp_num, max_num=args.max_num)
            if upto == "vote":
                return chain(img, kps), k
            pose = pl_mod.poses_from_keypoints(pts3d, kps, K)
            return chain(img, pose), k
        return step

    prev = 0.0
    for stage in ["fwd", "mask", "score", "select", "vote", "pose"]:
        t = timeit_chained(prefix(stage), (image, key0))
        print(f"upto {stage:7s}: {t*1e3:8.2f} ms/batch  (+{(t-prev)*1e3:7.2f})")
        prev = t


if __name__ == "__main__":
    main()
