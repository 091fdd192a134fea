import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from jax import random

def timeit_chained(step_fn, init_carry, iters=8):
    @jax.jit
    def run(carry):
        def body(c, _):
            return step_fn(c), None
        out, _ = jax.lax.scan(body, carry, None, length=iters)
        return out
    out = run(init_carry); jax.block_until_ready(out)
    t0 = time.perf_counter()
    out = run(init_carry); jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters

b, n, tn = 128, 307200, 1024
key = random.PRNGKey(0)
score0 = jnp.zeros((b, n), jnp.float32)

def noise_threefry(carry):
    s, k = carry
    u = random.uniform(k, (b, n), dtype=jnp.float32)
    return (s + u * 1e-12, random.fold_in(k, 0))
print(f"threefry uniform [b,307k]: {timeit_chained(noise_threefry, (score0, key))*1e3:8.2f} ms")

def noise_rbg(carry):
    s, k = carry
    kk = jnp.concatenate([k, k]).astype(jnp.uint32).reshape(4)
    _, bits = jax.lax.rng_bit_generator(kk, (b, n), dtype=jnp.uint32)
    u = (bits >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    return (s + u * 1e-12, random.fold_in(k, 0))
print(f"rbg philox  [b,307k]:      {timeit_chained(noise_rbg, (score0, key))*1e3:8.2f} ms")

sc = random.uniform(key, (b, n), dtype=jnp.float32)
def topk_only(carry):
    s = carry
    v, i = jax.lax.approx_max_k(s, tn)
    return s + v.mean() * 1e-12
print(f"approx_max_k only:         {timeit_chained(topk_only, sc)*1e3:8.2f} ms")
def exact_topk(carry):
    s = carry
    v, i = jax.lax.top_k(s, tn)
    return s + v.mean() * 1e-12
print(f"exact top_k:               {timeit_chained(exact_topk, sc)*1e3:8.2f} ms")
