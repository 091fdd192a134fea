"""Micro-benchmark: direct dilated 3x3 conv vs space-to-batch formulation.

The PVNet backbone's layer3/layer4 run at output stride 8 with kernel
dilation 2/4 (ref lib/networks/resnet.py:167-198). Dilated convs map poorly
onto the TPU conv units; space-to-batch rewrites a stride-1, pad=d dilated
conv as a dense 3x3 over d*d interleaved subgrids (exact, same math).

  python tools/bench_dilated.py [--batch 16]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(step_fn, x, iters=20):
    @jax.jit
    def run(x0):
        def body(c, _):
            y = step_fn(c)
            s = 1 + 1e-12 * y.astype(jnp.float32).mean()
            return (c * s).astype(c.dtype), None
        out, _ = jax.lax.scan(body, x0, None, length=iters)
        return out

    out = run(x)
    jax.block_until_ready(out)
    # time with a *different* input: the async axon tunnel memoizes whole
    # repeated dispatches with identical arguments
    perturbed = jax.tree.map(
        lambda t: t * (1 + 1e-6) if jnp.issubdtype(t.dtype, jnp.floating)
        else t, x)
    t0 = time.perf_counter()
    out = run(perturbed)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def conv_direct(x, w, d):
    dn = jax.lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), [(d, d)] * 2, rhs_dilation=(d, d),
        dimension_numbers=dn)


def conv_s2b(x, w, d):
    """space-to-batch: exact rewrite of stride-1 pad=d dilated 3x3."""
    B, H, W, C = x.shape
    # [B, H/d, d, W/d, d, C] -> [B, d, d, H/d, W/d, C] -> [B*d*d, H/d, W/d, C]
    xs = x.reshape(B, H // d, d, W // d, d, C).transpose(0, 2, 4, 1, 3, 5)
    xs = xs.reshape(B * d * d, H // d, W // d, C)
    dn = jax.lax.conv_dimension_numbers(xs.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    ys = jax.lax.conv_general_dilated(
        xs, w.astype(xs.dtype), (1, 1), [(1, 1)] * 2, dimension_numbers=dn)
    Co = ys.shape[-1]
    ys = ys.reshape(B, d, d, H // d, W // d, Co).transpose(0, 3, 1, 4, 2, 5)
    return ys.reshape(B, H, W, Co)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    args = ap.parse_args()
    rng = np.random.RandomState(0)
    B = args.batch
    print(f"batch={B} backend={jax.default_backend()}")
    for label, H, W, C, Co, d in [
        ("layer3 256->256 @60x80 d2", 60, 80, 256, 256, 2),
        ("layer4 512->512 @60x80 d4", 60, 80, 512, 512, 4),
    ]:
        x = jnp.asarray(rng.randn(B, H, W, C) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, C, Co) * 0.02, jnp.float32)

        # exactness check (CPU-cheap shapes would differ; do on-device)
        a = np.asarray(jax.jit(conv_direct, static_argnums=2)(x, w, d),
                       np.float32)
        b = np.asarray(jax.jit(conv_s2b, static_argnums=2)(x, w, d),
                       np.float32)
        err = np.abs(a - b).max() / (np.abs(a).max() + 1e-6)
        t_dir = timeit_chained(lambda c: conv_direct(c, w, d), x)
        t_s2b = timeit_chained(lambda c: conv_s2b(c, w, d), x)
        flops = 2 * B * H * W * 9 * C * Co
        print(f"{label}: direct {t_dir*1e3:7.3f} ms "
              f"({flops/t_dir/1e12:5.1f} TF/s)  s2b {t_s2b*1e3:7.3f} ms "
              f"({flops/t_s2b/1e12:5.1f} TF/s)  speedup {t_dir/t_s2b:4.2f}x  "
              f"maxrelerr {err:.5f}")


if __name__ == "__main__":
    main()
