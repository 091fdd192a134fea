"""Per-piece timing of the production training step (device-resident data).

The train bench (bench.py --train_batch) reports ~2 steps/s at b16 480x640
while the inference forward runs 37 ms at the same shape — so the step has
~4x the cost of fwd+bwd alone. This decomposes train_step_from_data into

  gather   HBM gather of the minibatch from the resident uint8 set
  aug      device augmentation (warps + jitter + normalize)
  vert     vertex-target generation from hcoords
  fwdbwd   jax.grad of the loss on a pre-augmented batch + Adam update
  full     the whole step

Each heavy input derives from the scan carry (see CLAUDE.md timing rules).

  python tools/bench_train_pieces.py [--pieces gather,aug,vert,fwdbwd,full]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--pieces", default="gather,aug,vert,fwdbwd,full",
                    help="also: warp,photo,stats (aug sub-pieces)")
    ap.add_argument("--head_layout", default="NHWC",
                    choices=("NHWC", "NCHW"),
                    help="head/loss layout for fwdbwd and full pieces")
    ap.add_argument("--input_layout", default="NHWC",
                    choices=("NHWC", "NCHW"),
                    help="image layout between aug and conv1 for the "
                         "aug/fwdbwd/full pieces (NCHW = channel-major "
                         "handoff, no [b,h,w,3] materialization)")
    args = ap.parse_args()
    pieces = set(args.pieces.split(","))

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.config import TrainConfig
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.train import trainer
    from pvnet_tpu.train.loss import total_loss
    from pvnet_tpu.utils.benchlib import timeit_chained

    b, h, w = args.batch, args.height, args.width
    cfg = TrainConfig(model_name="bench", train_batch_size=b)
    model = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                        dtype=jnp.bfloat16, head_layout=args.head_layout,
                        input_layout=args.input_layout)
    key = jax.random.PRNGKey(7)
    in_shape = ((1, 3, h, w) if args.input_layout == "NCHW"
                else (1, h, w, 3))
    state = trainer.create_train_state(model, cfg, in_shape, key)

    n = max(2 * b, 32)
    rng = np.random.RandomState(11)
    data = {
        "image": jnp.asarray(rng.randint(0, 256, (n, h, w, 3), np.uint8)),
        "mask": jnp.asarray((rng.rand(n, h, w) < 0.05).astype(np.uint8)),
        "hcoords": jnp.asarray(np.concatenate(
            [rng.rand(n, 9, 1) * w, rng.rand(n, 9, 1) * h,
             np.ones((n, 9, 1))], axis=-1).astype(np.float32)),
    }
    aug_hw = (h, w)
    print(f"b={b} {h}x{w} pieces={sorted(pieces)}", flush=True)
    results = {}

    def idx_of(acc, k):
        return jax.random.randint(jax.random.fold_in(k, acc.astype(
            jnp.int32)), (b,), 0, n)

    if "gather" in pieces:
        def gather_step(carry):
            acc, k = carry
            idx = idx_of(acc, k)
            img = data["image"][idx]
            m = data["mask"][idx]
            hc = data["hcoords"][idx]
            return (acc + 1.0 + img.astype(jnp.float32).mean() * 1e-6
                    + m.astype(jnp.float32).mean() * 1e-6
                    + hc.mean() * 1e-6, k)
        results["gather"] = timeit_chained(
            gather_step, (jnp.float32(1.0), key), args.iters)
        print(f"gather: {results['gather'] * 1e3:.2f} ms", flush=True)

    if "aug" in pieces:
        from pvnet_tpu.data.augment_device import augment_batch

        def aug_step(carry):
            acc, k = carry
            idx = idx_of(acc, k)
            # uint8 in, like production _apply_device_aug (packed warp)
            img, m, hc = augment_batch(
                data["image"][idx],
                data["mask"][idx].astype(jnp.int32),
                data["hcoords"][idx], jax.random.fold_in(k, 1), aug_hw,
                cfg.aug_cfg, out_layout=args.input_layout)
            return (acc + 1.0 + img.mean() * 1e-6
                    + m.astype(jnp.float32).mean() * 1e-6
                    + hc.mean() * 1e-6, k)
        results["aug"] = timeit_chained(
            aug_step, (jnp.float32(1.0), key), args.iters)
        print(f"aug (incl. gather): {results['aug'] * 1e3:.2f} ms",
              flush=True)

    if "stats" in pieces:
        from pvnet_tpu.data import augment_device as ad

        def stats_step(carry):
            acc, k = carry
            idx = idx_of(acc, k)
            m = data["mask"][idx]
            wk = jax.random.split(jax.random.fold_in(k, 2), b)
            Ms = jax.vmap(lambda mm, kk: ad._sample_warp(
                mm, kk, h, w, cfg.aug_cfg))(m, wk)
            return (acc + 1.0 + Ms.mean() * 1e-6, k)
        results["stats"] = timeit_chained(
            stats_step, (jnp.float32(1.0), key), args.iters)
        print(f"stats (incl. gather): {results['stats'] * 1e3:.2f} ms",
              flush=True)

    if "warp" in pieces:
        from pvnet_tpu.data import augment_device as ad

        def warp_step(carry):
            acc, k = carry
            idx = idx_of(acc, k)
            img = data["image"][idx].astype(jnp.float32)
            m = data["mask"][idx].astype(jnp.int32)
            wk = jax.random.split(jax.random.fold_in(k, 2), b)
            Ms = jax.vmap(lambda mm, kk: ad._sample_warp(
                mm, kk, h, w, cfg.aug_cfg))(m, wk)
            img2, m2 = jax.vmap(lambda im, mm, M: ad._warp_image(
                im, mm, M, h, w))(img, m, Ms)
            return (acc + 1.0 + img2.mean() * 1e-6
                    + m2.astype(jnp.float32).mean() * 1e-6, k)
        results["warp"] = timeit_chained(
            warp_step, (jnp.float32(1.0), key), args.iters)
        print(f"warp (incl. gather+stats): {results['warp'] * 1e3:.2f} ms",
              flush=True)

    if "photo" in pieces:
        from pvnet_tpu.data import augment_device as ad
        from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD

        def photo_step(carry):
            acc, k = carry
            idx = idx_of(acc, k)
            img = data["image"][idx].astype(jnp.float32)
            k_flip, k_blur, k_jit, k_sel = jax.random.split(
                jax.random.fold_in(k, 3), 4)
            do = jax.random.bernoulli(k_flip, 0.5, (b,))
            img = jnp.where(do[:, None, None, None], img[:, :, ::-1], img)
            bank = ad._gauss_weights_bank()
            sel = jax.random.randint(k_sel, (b,), 0, 4)
            blurred = ad._separable_blur(img, bank[sel])
            do2 = jax.random.bernoulli(k_blur, 0.5, (b,))
            img = jnp.where(do2[:, None, None, None], blurred, img)
            img = ad._color_jitter(img, k_jit, cfg.aug_cfg)
            mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
            std = jnp.asarray(IMAGENET_STD, jnp.float32)
            img = (img / 255.0 - mean) / std
            return (acc + 1.0 + img.mean() * 1e-6, k)
        results["photo"] = timeit_chained(
            photo_step, (jnp.float32(1.0), key), args.iters)
        print(f"photo (flip+blur+jitter+norm, incl. gather): "
              f"{results['photo'] * 1e3:.2f} ms", flush=True)

    if "vert" in pieces:
        from pvnet_tpu.data.vertex import compute_vertex_targets

        def vert_step(carry):
            acc, k = carry
            idx = idx_of(acc, k)
            v = compute_vertex_targets(
                data["mask"][idx].astype(jnp.int32), data["hcoords"][idx],
                layout=args.head_layout)
            return (acc + 1.0 + v.mean() * 1e-6, k)
        results["vert"] = timeit_chained(
            vert_step, (jnp.float32(1.0), key), args.iters)
        print(f"vert (incl. gather): {results['vert'] * 1e3:.2f} ms",
              flush=True)

    if "fwdbwd" in pieces:
        import optax
        from pvnet_tpu.data.augment_device import augment_batch
        from pvnet_tpu.data.vertex import compute_vertex_targets

        # pre-augmented, pre-targeted batch (the expensive tensors)
        idx0 = jnp.arange(b)
        img0, m0, hc0 = jax.jit(lambda: augment_batch(
            data["image"][idx0].astype(jnp.float32),
            data["mask"][idx0].astype(jnp.int32),
            data["hcoords"][idx0], key, aug_hw, cfg.aug_cfg,
            out_layout=args.input_layout))()
        vert0 = jax.jit(lambda: compute_vertex_targets(
            m0, hc0, layout=args.head_layout))()
        if args.head_layout == "NCHW":
            vw0 = (m0 > 0)[:, None].astype(jnp.float32)
        else:
            vw0 = (m0 > 0)[..., None].astype(jnp.float32)
        ca = 1 if args.head_layout == "NCHW" else -1
        jax.block_until_ready(vert0)

        def fwdbwd_step(carry):
            # the fixed batch tensors ride the carry unchanged: as jit
            # ARGUMENTS they stay out of the compile payload (vert0 alone
            # is 354 MB f32 — embedding it as a program constant blows the
            # remote-compile request limit with HTTP 413)
            st, acc, img0, m0, vert0, vw0 = carry
            img = jnp.roll(img0, acc.astype(jnp.int32) % b, axis=0)

            def loss_fn(params):
                (seg_pred, ver_pred), mutated = st.apply_fn(
                    {"params": params, "batch_stats": st.batch_stats},
                    img, train=True, mutable=["batch_stats"])
                loss, metrics = total_loss(
                    seg_pred, ver_pred,
                    jnp.roll(m0, acc.astype(jnp.int32) % b, axis=0),
                    jnp.roll(vert0, acc.astype(jnp.int32) % b, axis=0),
                    jnp.roll(vw0, acc.astype(jnp.int32) % b, axis=0), 1.0,
                    channel_axis=ca)
                return loss, (metrics, mutated["batch_stats"])

            grads, (metrics, new_stats) = jax.grad(
                loss_fn, has_aux=True)(st.params)
            updates, new_opt = st.tx.update(grads, st.opt_state, st.params)
            new_params = optax.apply_updates(st.params, updates)
            st = st.replace(step=st.step + 1, params=new_params,
                            batch_stats=new_stats, opt_state=new_opt)
            return (st, acc + 1.0 + metrics["loss"].astype(jnp.float32)
                    * 1e-3, img0, m0, vert0, vw0)
        results["fwdbwd"] = timeit_chained(
            fwdbwd_step, (state, jnp.float32(1.0), img0, m0, vert0, vw0),
            args.iters)
        print(f"fwdbwd+adam: {results['fwdbwd'] * 1e3:.2f} ms", flush=True)

    if "full" in pieces:
        step = functools.partial(trainer.train_step_from_data,
                                 vertex_loss_ratio=cfg.vertex_loss_ratio,
                                 aug_cfg=cfg.aug_cfg, aug_hw=aug_hw,
                                 head_layout=args.head_layout,
                                 input_layout=args.input_layout)

        def full_step(carry):
            st, acc = carry
            k = jax.random.fold_in(jax.random.PRNGKey(13),
                                   acc.astype(jnp.int32))
            k1, k2 = jax.random.split(k)
            idx = jax.random.randint(k1, (b,), 0, n)
            st, metrics = step(st, data, idx, k2)
            return (st, acc + 1.0
                    + metrics["loss"].astype(jnp.float32) * 1e-3)
        results["full"] = timeit_chained(
            full_step, (state, jnp.float32(1.0)), args.iters)
        print(f"full step: {results['full'] * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
