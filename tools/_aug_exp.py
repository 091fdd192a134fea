import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from pvnet_tpu.config import AugConfig
from pvnet_tpu.data import augment_device as AD

rng = np.random.RandomState(0)
b, H, W = 8, 480, 640
img = jnp.asarray(rng.randint(0, 255, (b, H, W, 3)).astype(np.float32))
mask = np.zeros((b, H, W), np.int32); mask[:, 100:300, 200:400] = 1
mask = jnp.asarray(mask)
hc = jnp.asarray(rng.uniform(200, 400, (b, 9, 3)).astype(np.float32))
cfg = AugConfig()

def timeit(fn, *args, iters=10):
    out = fn(*args); jax.block_until_ready(out)
    ts = []
    for i in range(3):
        t0 = time.perf_counter()
        for j in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        ts.append((time.perf_counter() - t0) / iters)
    return min(ts)

full = jax.jit(lambda i, m, h, k: AD.augment_batch(i, m, h, k, (256, 256), cfg))
keys = [jax.random.PRNGKey(i) for i in range(4)]
t = min(timeit(full, img, mask, hc, k) for k in keys)
print(f"augment_batch full [8,480,640]->256: {t*1e3:8.2f} ms")

# warp only
cfg2 = AugConfig(blur=False, jitter=False)
warp_only = jax.jit(lambda i, m, h, k: AD.augment_batch(i, m, h, k, (256, 256), cfg2, normalize=False))
t = min(timeit(warp_only, img, mask, hc, k) for k in keys)
print(f"warp only:                           {t*1e3:8.2f} ms")

cfg3 = AugConfig(rotation=False, crop=False, blur=True, jitter=False)
blur_only = jax.jit(lambda i, m, h, k: AD.augment_batch(i, m, h, k, (256, 256), cfg3, normalize=False))
t = min(timeit(blur_only, img, mask, hc, k) for k in keys)
print(f"blur only (on 256 crop):             {t*1e3:8.2f} ms")

cfg4 = AugConfig(rotation=False, crop=False, blur=False, jitter=True)
jit_only = jax.jit(lambda i, m, h, k: AD.augment_batch(i, m, h, k, (256, 256), cfg4, normalize=False))
t = min(timeit(jit_only, img, mask, hc, k) for k in keys)
print(f"jitter only (on 256 crop):           {t*1e3:8.2f} ms")
