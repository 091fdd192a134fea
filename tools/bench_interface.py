"""Probe the producer->selection interface cost: when the vertex field is
produced *in-program* by a conv (like the FCN head), what does each
selection formulation add over the producer alone?

  python tools/bench_interface.py [--batch 16]
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
    from jax.experimental import pallas as pl
    from pvnet_tpu.ops import select_kernel as SK
    from pvnet_tpu.ops.voting import _phase_grid, _fast_uniform

    b, h, w, vn = args.batch, 480, 640, 9
    c = vn * 2
    tn = args.tn
    a, bb = _phase_grid(tn)
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    wconv = jnp.asarray(rng.randn(3, 3, 3, c + 2) * 0.1, jnp.float32)
    key0 = jax.random.PRNGKey(0)

    def produce(x):
        dn = jax.lax.conv_dimension_numbers(x.shape, wconv.shape,
                                            ("NHWC", "HWIO", "NHWC"))
        y = jax.lax.conv_general_dilated(x, wconv, (1, 1), [(1, 1)] * 2,
                                         dimension_numbers=dn)
        mask = (y[..., 0] > y[..., 1]).astype(jnp.int32)
        return mask, y[..., 2:]

    def chain(carry, x):
        v, k = carry
        s = 1 + 1e-12 * x.astype(jnp.float32).mean()
        return (v * s).astype(v.dtype), jax.random.fold_in(k, 0)

    def p_base(carry):
        x, k = carry
        mask, ver = produce(x)
        return chain(carry, ver + mask[..., None])

    def p_xla(carry):
        x, k = carry
        mask, ver = produce(x)
        score = mask.astype(jnp.float32) * 2.0 + _fast_uniform(k, mask.shape)
        best, idx, dirs = SK.stratified_select_xla(score, ver, a, bb)
        return chain(carry, dirs + best[..., None])

    def p_pallas(carry):
        x, k = carry
        mask, ver = produce(x)
        score = mask.astype(jnp.float32) * 2.0 + _fast_uniform(k, mask.shape)
        best, idx, dirs = SK.stratified_select(score, ver, a, bb)
        return chain(carry, dirs + best[..., None])

    def p_flatsum(carry):
        """force the flat [b, h, w*c] form without pallas: reduce over it"""
        x, k = carry
        mask, ver = produce(x)
        flat = ver.reshape(b, h, w * c)
        return chain(carry, flat[:, ::7, ::11] + mask[..., None, None]
                     .astype(jnp.float32).sum())

    def p_pallas_standalone_src(carry):
        """pallas select on the *carried* image expanded — no conv producer
        (control: should match the standalone micro-bench)"""
        x, k = carry
        ver = jnp.concatenate([x] * 6, axis=-1)             # [b,h,w,18]
        mask = (x[..., 0] > 0).astype(jnp.int32)
        score = mask.astype(jnp.float32) * 2.0 + _fast_uniform(k, mask.shape)
        best, idx, dirs = SK.stratified_select(score, ver, a, bb)
        return chain(carry, dirs + best[..., None])

    def produce_nchw_conv(x):
        dn = jax.lax.conv_dimension_numbers(x.shape, wconv.shape,
                                            ("NHWC", "HWIO", "NCHW"))
        y = jax.lax.conv_general_dilated(x, wconv, (1, 1), [(1, 1)] * 2,
                                         dimension_numbers=dn)
        mask = (y[:, 0] > y[:, 1]).astype(jnp.int32)
        return mask, y[:, 2:]

    def produce_nchw_dot(x):
        # 1x1-conv as dot with the field dim leading, then a major-dims
        # transpose (moves whole [h, w] planes; minor dims untouched)
        w0 = wconv[1, 1]                                    # [3, c+2]
        y = jax.lax.dot_general(w0, x, (((0,), (3,)), ((), ())))
        y = y.transpose(1, 0, 2, 3)                         # [b, c+2, h, w]
        mask = (y[:, 0] > y[:, 1]).astype(jnp.int32)
        return mask, y[:, 2:]

    def p_nchw_conv_base(carry):
        x, k = carry
        mask, ver = produce_nchw_conv(x)
        return chain(carry, ver + mask[:, None].astype(jnp.float32))

    def p_nchw_conv(carry):
        x, k = carry
        mask, ver = produce_nchw_conv(x)
        score = mask.astype(jnp.float32) * 2.0 + _fast_uniform(k, mask.shape)
        best, idx, dirs = SK.stratified_select_cmajor(score, ver, a, bb)
        return chain(carry, dirs + best[..., None])

    def p_nchw_dot_base(carry):
        x, k = carry
        mask, ver = produce_nchw_dot(x)
        return chain(carry, ver + mask[:, None].astype(jnp.float32))

    def p_nchw_dot(carry):
        x, k = carry
        mask, ver = produce_nchw_dot(x)
        score = mask.astype(jnp.float32) * 2.0 + _fast_uniform(k, mask.shape)
        best, idx, dirs = SK.stratified_select_cmajor(score, ver, a, bb)
        return chain(carry, dirs + best[..., None])

    cases = [("producer_only", p_base), ("producer+xla", p_xla),
             ("producer+pallas", p_pallas), ("producer+flatview", p_flatsum),
             ("concat+pallas", p_pallas_standalone_src),
             ("nchwconv_only", p_nchw_conv_base),
             ("nchwconv+pallas", p_nchw_conv),
             ("nchwdot_only", p_nchw_dot_base),
             ("nchwdot+pallas", p_nchw_dot)]
    prev = None
    for name, fn in cases:
        t = timeit_chained(fn, (img, key0))
        print(f"{name:22s}: {t*1e3:8.2f} ms/batch")


if __name__ == "__main__":
    main()
