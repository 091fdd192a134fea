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

from pvnet_tpu.ops import pnp as pnp_mod
from pvnet_tpu.ops.geometry import project
rng = np.random.RandomState(0)
K = jnp.asarray([[572.4, 0, 325.3], [0, 573.6, 242.0], [0, 0, 1.]], jnp.float32)
pts3d = jnp.asarray(rng.uniform(-0.06, 0.06, (9, 3)), jnp.float32)
b = 128
# realistic observations: random poses projected + noise
from pvnet_tpu.ops.geometry import rodrigues
axs = rng.randn(b, 3) * 0.8
ts = np.stack([rng.uniform(-0.1, 0.1, b), rng.uniform(-0.1, 0.1, b), rng.uniform(0.5, 1.2, b)], -1)
Rs = np.stack([np.asarray(rodrigues(jnp.asarray(a, jnp.float32))) for a in axs])
poses = np.concatenate([Rs, ts[..., None]], -1).astype(np.float32)
p2d = np.stack([np.asarray(project(pts3d, jnp.asarray(p), K)) for p in poses])
p2d += rng.randn(*p2d.shape) * 1.0
p2dj = jnp.asarray(p2d, jnp.float32)

def step_full(carry):
    x = carry
    out = pnp_mod.pnp_batch(pts3d, x, K)
    return x + out[:, 0, 0, None, None] * 1e-12
print(f"pnp_batch (epnp+4x30 LM): {timeit_chained(step_full, p2dj)*1e3:8.2f} ms")

# epnp alone
def step_epnp(carry):
    x = carry
    out = jax.vmap(lambda q: pnp_mod.epnp(pts3d, q, K))(x)
    return x + out[:, 0, 0, None, None] * 1e-12
print(f"epnp alone:               {timeit_chained(step_epnp, p2dj)*1e3:8.2f} ms")

# LM alone single-start
w3 = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 1.0]), (b, 9, 3))
pose0 = jax.vmap(lambda q: pnp_mod.epnp(pts3d, q, K))(p2dj)
def step_lm(carry):
    x = carry
    out = jax.vmap(lambda p0, q, w: pnp_mod.lm_refine(p0, pts3d, q, K, w)[0])(pose0, x, w3)
    return x + out[:, 0, 0, None, None] * 1e-12
print(f"lm 1-start 30 iters:      {timeit_chained(step_lm, p2dj)*1e3:8.2f} ms")

# accuracy check with fewer iters / fewer starts
import functools
for iters in (30, 15, 10):
    sol = jax.jit(jax.vmap(lambda q: pnp_mod.pnp(pts3d, q, K, iters=iters)))(p2dj)
    sol = np.asarray(sol)
    rerr = np.linalg.norm(sol[:, :, :3] - poses[:, :, :3], axis=(1, 2)).max()
    terr = np.linalg.norm(sol[:, :, 3] - poses[:, :, 3], axis=1).max() * 100
    print(f"iters={iters}: max Rerr(F-norm) {rerr:.4f}  max terr {terr:.3f} cm")
