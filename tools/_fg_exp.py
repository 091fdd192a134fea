import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp

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

from pvnet_tpu.ops import voting
rng = np.random.RandomState(0)
b, tn, vn = 128, 1024, 9
H, W = 480, 640
mask = (rng.rand(b, H, W) < 0.02).astype(np.int32)  # ~6k fg px
vertex = rng.randn(b, H, W, vn, 2).astype(np.float32)
maskj, vertexj = jnp.asarray(mask), jnp.asarray(vertex)
key = jax.random.PRNGKey(0)

def s1(carry):
    v, k = carry
    fg = voting.sample_foreground(maskj, v, tn, k)
    return (v + fg.coords.mean() * 1e-12, jax.random.fold_in(k, 0))
print(f"sample_foreground 480x640 b128: {timeit_chained(s1, (vertexj, key))*1e3:8.2f} ms")

def s2(carry):
    v, k = carry
    kp = voting.ransac_voting_v3(maskj, v, k, hyp_num=1024, max_num=tn)
    return (v + kp.mean() * 1e-12, jax.random.fold_in(k, 0))
print(f"full v3 480x640 b128:           {timeit_chained(s2, (vertexj, key))*1e3:8.2f} ms")
