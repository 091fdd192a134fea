import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import random

def timeit_chained(step_fn, make_carry, iters=8, reps=3):
    @jax.jit
    def run(carry):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, carry, None, length=iters)
        return out
    out = run(make_carry(0)); jax.block_until_ready(out)  # compile
    best = []
    for r in range(1, reps + 1):
        c = make_carry(r)
        jax.block_until_ready(c)
        t0 = time.perf_counter()
        out = run(c); jax.block_until_ready(out)
        best.append((time.perf_counter() - t0) / iters)
    return min(best)

b, n, tn = 128, 307200, 1024
key = random.PRNGKey(0)

def mk(r):
    return (jnp.full((b, n), float(r), jnp.float32), random.PRNGKey(r))

def noise_threefry(carry):
    s, k = carry
    u = random.uniform(k, (b, n), dtype=jnp.float32)
    return (s + u * 1e-12, random.fold_in(k, 0))
print(f"threefry uniform [b,307k]: {timeit_chained(noise_threefry, mk)*1e3:8.2f} ms")

def topk_only(carry):
    s, k = carry
    v, i = jax.lax.approx_max_k(s, tn)
    return (s + v.mean() * 1e-12, k)
print(f"approx_max_k only:         {timeit_chained(topk_only, mk)*1e3:8.2f} ms")

def exact_topk(carry):
    s, k = carry
    v, i = jax.lax.top_k(s, tn)
    return (s + v.mean() * 1e-12, k)
print(f"exact top_k:               {timeit_chained(exact_topk, mk)*1e3:8.2f} ms")

from pvnet_tpu.ops import voting
rng = np.random.RandomState(0)
vn, H, W = 9, 480, 640
mask = (rng.rand(b, H, W) < 0.02).astype(np.int32)
maskj = jnp.asarray(mask)
def mkv(r):
    return (jnp.asarray(rng.randn(b, H, W, vn, 2).astype(np.float32)), random.PRNGKey(r))
def s_old(carry):
    v, k = carry
    fgx = voting.sample_foreground(maskj, v, tn, k)
    return (v + fgx.coords.mean() * 1e-12, random.fold_in(k, 0))
print(f"sample_foreground:         {timeit_chained(s_old, mkv)*1e3:8.2f} ms")
