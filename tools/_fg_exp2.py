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

from pvnet_tpu.ops import voting
from pvnet_tpu.ops.voting import ForegroundSample

def sample_fg_bucket(mask, vertex, tn, key):
    b, h, w = mask.shape
    vn = vertex.shape[3]
    n = h * w
    pad = (-n) % tn
    m = (n + pad) // tn
    fg = (mask != 0).reshape(b, n)
    total = jnp.sum(fg, axis=1).astype(jnp.int32)
    noise = random.uniform(key, (b, n), dtype=jnp.float32)
    score = fg.astype(jnp.float32) * 2.0 + noise
    if pad:
        score = jnp.pad(score, ((0, 0), (0, pad)))
    score = score.reshape(b, m, tn)                       # bucket i = col i
    top = jnp.argmax(score, axis=1)                       # [b, tn] row j
    top_scores = jnp.take_along_axis(score, top[:, None, :], axis=1)[:, 0]
    top_idx = top * tn + jnp.arange(tn)[None, :]          # global flat idx
    valid = top_scores >= 2.0
    top_idx = jnp.minimum(top_idx, n - 1)
    xs = (top_idx % w).astype(jnp.float32)
    ys = (top_idx // w).astype(jnp.float32)
    coords = jnp.stack([xs, ys], axis=-1)
    vertex_flat = vertex.reshape(b, n, vn, 2)
    dirs = jnp.take_along_axis(vertex_flat, top_idx[:, :, None, None], axis=1)
    dirs = dirs * valid[:, :, None, None].astype(dirs.dtype)
    count = jnp.sum(valid, axis=1).astype(jnp.int32)
    return ForegroundSample(coords, dirs, valid, count, total)

rng = np.random.RandomState(0)
b, tn, vn = 128, 1024, 9
H, W = 480, 640
mask = (rng.rand(b, H, W) < 0.02).astype(np.int32)
vertex = rng.randn(b, H, W, vn, 2).astype(np.float32)
maskj, vertexj = jnp.asarray(mask), jnp.asarray(vertex)
key = random.PRNGKey(0)

def s_old(carry):
    v, k = carry
    fgx = voting.sample_foreground(maskj, v, tn, k)
    return (v + fgx.coords.mean() * 1e-12, random.fold_in(k, 0))
def s_new(carry):
    v, k = carry
    fgx = sample_fg_bucket(maskj, v, tn, k)
    return (v + fgx.coords.mean() * 1e-12, random.fold_in(k, 0))
print(f"old approx_max_k: {timeit_chained(s_old, (vertexj, key))*1e3:8.2f} ms")
print(f"new bucket max:   {timeit_chained(s_new, (vertexj, key))*1e3:8.2f} ms")

# statistics: coverage at several fg sizes
for n_fg_frac, label in [(0.02, "6k fg"), (0.002, "600 fg"), (0.0002, "60 fg")]:
    m1 = (rng.rand(4, H, W) < n_fg_frac).astype(np.int32)
    fgs = sample_fg_bucket(jnp.asarray(m1), jnp.asarray(rng.randn(4, H, W, vn, 2).astype(np.float32)), tn, key)
    kept = np.asarray(fgs.count); tot = np.asarray(fgs.total)
    # valid coords actually on fg
    c = np.asarray(fgs.coords); v = np.asarray(fgs.valid)
    okk = all(m1[i][c[i, v[i], 1].astype(int), c[i, v[i], 0].astype(int)].all() for i in range(4))
    print(f"{label}: kept {kept} of {tot}, all-on-fg={okk}")
