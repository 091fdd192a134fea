"""Micro-bisect sample_foreground: which part of foreground selection is
slow on TPU (noise RNG, approx_max_k, or the full-resolution gather)?

  python tools/bench_select.py [--batch 16]
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
    ap.add_argument("--tn", type=int, default=1024)
    args = ap.parse_args()
    import jax
    import jax.numpy as jnp

    b, h, w, vn = args.batch, 480, 640, 9
    tn = args.tn
    hw = h * w
    rng = np.random.RandomState(0)
    mask = jnp.asarray(rng.rand(b, h, w) > 0.9, jnp.int32)
    vertex = jnp.asarray(rng.randn(b, h, w, vn, 2), jnp.float32)
    key0 = jax.random.PRNGKey(0)

    def chain(carry, x):
        v, k = carry
        s = 1 + 1e-12 * x.astype(jnp.float32).mean()
        return (v * s).astype(v.dtype), jax.random.fold_in(k, 0)

    def noise_only(carry):
        v, k = carry
        noise = jax.random.uniform(k, (b, hw), dtype=jnp.float32)
        return chain(carry, noise)

    def noise_topk(carry):
        v, k = carry
        noise = jax.random.uniform(k, (b, hw), dtype=jnp.float32)
        score = mask.reshape(b, hw).astype(jnp.float32) * 2.0 + noise
        s, i = jax.lax.approx_max_k(score, tn)
        return chain(carry, s + i.astype(jnp.float32).mean())

    def topk_exact(carry):
        v, k = carry
        noise = jax.random.uniform(k, (b, hw), dtype=jnp.float32)
        score = mask.reshape(b, hw).astype(jnp.float32) * 2.0 + noise
        s, i = jax.lax.top_k(score, tn)
        return chain(carry, s + i.astype(jnp.float32).mean())

    def gather_only(carry):
        v, k = carry
        # fixed indices: isolates the gather cost
        idx = jnp.broadcast_to(jnp.arange(tn, dtype=jnp.int32) * 7, (b, tn))
        vf = v.reshape(b, hw, vn, 2)
        dirs = jnp.take_along_axis(vf, idx[:, :, None, None], axis=1)
        return chain(carry, dirs)

    def full(carry):
        v, k = carry
        from pvnet_tpu.ops.voting import sample_foreground
        fg = sample_foreground(mask, v, tn, k)
        return chain(carry, fg.dirs)

    def bucket(carry):
        """stratified: strided buckets + per-bucket argmax."""
        v, k = carry
        nb = hw // tn                                        # bucket size
        noise = jax.random.uniform(k, (b, hw), dtype=jnp.float32)
        score = mask.reshape(b, hw).astype(jnp.float32) * 2.0 + noise
        sb = score.reshape(b, nb, tn)                        # strided buckets
        j = jnp.argmax(sb, axis=1)                           # [b, tn]
        top = jnp.take_along_axis(sb, j[:, None, :], axis=1)[:, 0]
        idx = j * tn + jnp.arange(tn)[None, :]
        vf = v.reshape(b, hw, vn, 2)
        dirs = jnp.take_along_axis(vf, idx[:, :, None, None], axis=1)
        return chain(carry, dirs + top[..., None, None])

    # --- stratified internals (vertex produced from a bf16 source, like
    # the FCN's ver_pred, so XLA sees the same producer fusion) ---
    from pvnet_tpu.ops.voting import (_phase_grid,
                                      _sample_foreground_stratified)
    vertex_bf = vertex.astype(jnp.bfloat16)
    a, bb = _phase_grid(tn)
    ty_n, tx_n = h // a, w // bb
    nb2 = ty_n * tx_n

    def strat_full(carry):
        v, k = carry
        vf = v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
        fg = _sample_foreground_stratified(mask, vf, tn, k)
        return chain(carry, fg.dirs)

    def strat_argmax_only(carry):
        v, k = carry
        noise = jax.random.uniform(k, (b, h, w), dtype=jnp.float32)
        score = mask.astype(jnp.float32) * 2.0 + noise
        s5 = score.reshape(b, ty_n, a, tx_n, bb)
        st = s5.transpose(0, 2, 4, 1, 3).reshape(b, tn, nb2)
        sel = jnp.argmax(st, axis=2)
        return chain(carry, sel)

    def strat_reduce_only(carry):
        v, k = carry
        vf = v.astype(jnp.float32) if v.dtype == jnp.bfloat16 else v
        sel = jnp.broadcast_to(
            (jnp.arange(tn, dtype=jnp.int32) * 7) % nb2, (b, tn))
        ty = (sel // tx_n).reshape(b, a, bb)
        tx = (sel % tx_n).reshape(b, a, bb)
        eq_y = (jax.lax.broadcasted_iota(jnp.int32, (b, ty_n, a, 1, bb), 1)
                == ty[:, None, :, None, :])
        eq_x = (jax.lax.broadcasted_iota(jnp.int32, (b, 1, a, tx_n, bb), 3)
                == tx[:, None, :, None, :])
        onehot = eq_y & eq_x
        v6 = vf.reshape(b, ty_n, a, tx_n, bb, vn * 2)
        dirs = jnp.sum(v6 * onehot[..., None].astype(v6.dtype), axis=(1, 3))
        return chain(carry, dirs)

    def strat_reduce_bf16(carry):
        v, k = carry
        sel = jnp.broadcast_to(
            (jnp.arange(tn, dtype=jnp.int32) * 7) % nb2, (b, tn))
        ty = (sel // tx_n).reshape(b, a, bb)
        tx = (sel % tx_n).reshape(b, a, bb)
        eq_y = (jax.lax.broadcasted_iota(jnp.int32, (b, ty_n, a, 1, bb), 1)
                == ty[:, None, :, None, :])
        eq_x = (jax.lax.broadcasted_iota(jnp.int32, (b, 1, a, tx_n, bb), 3)
                == tx[:, None, :, None, :])
        onehot = eq_y & eq_x
        v6 = v.reshape(b, ty_n, a, tx_n, bb, vn * 2)
        dirs = jnp.sum(jnp.where(onehot[..., None], v6, 0).astype(
            jnp.float32), axis=(1, 3))
        return chain(carry, dirs)

    def kernel_only(carry):
        v, k = carry
        from pvnet_tpu.ops import select_kernel as SKm
        from pvnet_tpu.ops.voting import _phase_grid
        aa, bbb = _phase_grid(tn)
        score = mask.astype(jnp.float32) * 2.0
        vf = v.reshape(b, h, w, vn * 2)
        if v.dtype == jnp.bfloat16:
            vf = vf
        best, idx, dirs = SKm.stratified_select(score, vf, aa, bbb)
        return chain(carry, dirs)

    cases = [("kernel_only", kernel_only, vertex),
             ("kernel_only_bf16", kernel_only, vertex_bf),
             ("noise_only", noise_only, vertex),
             ("noise+approxk", noise_topk, vertex),
             ("noise+exactk", topk_exact, vertex),
             ("gather_only", gather_only, vertex),
             ("full_select", full, vertex),
             ("bucket_argmax", bucket, vertex),
             ("strat_full_f32", strat_full, vertex),
             ("strat_full_bf16src", strat_full, vertex_bf),
             ("strat_argmax_only", strat_argmax_only, vertex),
             ("strat_reduce_f32", strat_reduce_only, vertex),
             ("strat_reduce_bf16src", strat_reduce_only, vertex_bf),
             ("strat_where_bf16", strat_reduce_bf16, vertex_bf)]
    for name, fn, v0 in cases:
        t = timeit_chained(fn, (v0, key0))
        print(f"{name:20s}: {t*1e3:8.2f} ms/batch")


if __name__ == "__main__":
    main()
