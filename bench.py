"""Benchmark: end-to-end pose estimation throughput on one TPU chip.

Measures the fully fused image -> FCN -> RANSAC voting -> PnP pipeline at
the reference's eval resolution (480x640, LINEMOD). The reference reports
~25 ms/frame (~40 fps) on a GTX 1080 Ti for the same pipeline (PVNet paper
via README.md:11; the repo itself publishes no numbers — see BASELINE.md).

Realism: inputs are rendered synthetic object views (ImageNet-normalized,
realistic foreground occupancy), and the network loads the committed
synthetic-trained weights when present (assets/duck_ckpt.msgpack), so
segmentation masks, foreground statistics, and PnP all do real work. With
no checkpoint the same images run under random init (identical compute
envelope — every pipeline stage is fixed-shape — flagged in the JSON).

Prints ONE JSON line:
  {"metric": "linemod_poses_per_sec_per_chip", "value": N,
   "unit": "poses/s", "vs_baseline": N / 40.0, "weights": ...,
   "stage_ms": {...}, "uncertainty_poses_per_sec": N}
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

CKPT_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "assets", "duck_ckpt.msgpack")


def build_inputs(batch: int, h: int, w: int, seed: int = 0,
                 uint8: bool = False):
    """Rendered synthetic eval views, ImageNet-normalized.

    A few distinct base renders (z-buffer rasterizer, occluders included)
    are tiled to the batch with per-image brightness jitter so repeated
    dispatches stay distinct through the async tunnel."""
    from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD, LINEMOD_K
    from pvnet_tpu.data.synthetic import (make_distractor_mesh,
                                          make_duck_mesh,
                                          render_synthetic_view,
                                          sample_distractors,
                                          sample_object_pose)
    rng = np.random.RandomState(seed)
    mesh = make_duck_mesh()
    dmeshes = [make_distractor_mesh(rng) for _ in range(3)]
    K = LINEMOD_K.copy()
    K[0] *= w / 640.0
    K[1] *= h / 480.0
    n_base = min(batch, 8)
    base, raw_base = [], []
    for _ in range(n_base):
        pose = sample_object_pose(rng)
        dist = sample_distractors(pose, rng, dmeshes, occluder_prob=0.3,
                                  max_clutter=1)
        rgb, _ = render_synthetic_view(mesh, pose, K, h, w, rng,
                                       distractors=dist)
        raw_base.append(rgb)
        base.append((rgb.astype(np.float32) / 255.0 - IMAGENET_MEAN)
                    / IMAGENET_STD)
    reps = -(-batch // n_base)
    if uint8:
        raw = np.tile(np.stack(raw_base), (reps, 1, 1, 1))[:batch]
        jit = rng.randint(-3, 4, (batch, 1, 1, 1))
        return jnp.asarray(np.clip(raw.astype(np.int16) + jit, 0,
                                   255).astype(np.uint8))
    images = np.tile(np.stack(base), (reps, 1, 1, 1))[:batch]
    images += rng.randn(batch, 1, 1, 1).astype(np.float32) * 0.01
    return jnp.asarray(images)


def load_weights(model, image, ckpt_path):
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)
    if not os.path.exists(ckpt_path):
        return variables, "random"
    from flax import serialization
    with open(ckpt_path, "rb") as f:
        restored = serialization.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, f.read())
    # from_bytes yields host numpy arrays; park them in HBM once, or every
    # dispatch re-ships ~26 MB of weights through the tunnel (~1 s/batch).
    restored = jax.device_put(restored)
    return {"params": restored["params"],
            "batch_stats": restored["batch_stats"]}, "trained-synthetic"



from pvnet_tpu.utils.benchlib import timeit_chained


def bench_train_step(batch: int, h: int, w: int, iters: int,
                     head_layout: str = "NHWC",
                     input_layout: str = "NHWC"):
    """Training throughput: the production device-resident train step
    (trainer.train_step_from_data) — HBM-resident uint8 frames, on-device
    augmentation, vertex-target generation, forward+backward+Adam — timed
    with the chained harness. Mirrors the reference's training envelope
    (200 epochs, ref tools/train_linemod.py train()); the reference trains
    at batch 32 on 12 GB GPUs. On the channel-major layout full-res
    480x640 fits to at least b64 on a 16 GB chip; per-image throughput
    plateaus at b32-48 (knee sweep 2026-08-20, see --train_batch help).

    Returns (sec/step, aug_hw, batch)."""
    import functools
    from pvnet_tpu.config import TrainConfig
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.train import trainer

    cfg = TrainConfig(model_name="bench", train_batch_size=batch)
    model = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                        dtype=jnp.bfloat16, head_layout=head_layout,
                        input_layout=input_layout)
    key = jax.random.PRNGKey(7)
    in_shape = (1, 3, h, w) if input_layout == "NCHW" else (1, h, w, 3)
    state = trainer.create_train_state(model, cfg, in_shape, key)

    # small resident pool of distinct synthetic frames (the gather inside
    # the step is by index, so pool size doesn't change per-step cost)
    n = max(2 * batch, 32)
    rng = np.random.RandomState(11)
    data = {
        "image": jnp.asarray(rng.randint(0, 256, (n, h, w, 3), np.uint8)),
        "mask": jnp.asarray(
            (rng.rand(n, h, w) < 0.05).astype(np.uint8)),
        "hcoords": jnp.asarray(np.concatenate(
            [rng.rand(n, 9, 1) * w, rng.rand(n, 9, 1) * h,
             np.ones((n, 9, 1))], axis=-1).astype(np.float32)),
    }
    aug_hw = (h, w)
    step = functools.partial(trainer.train_step_from_data,
                             vertex_loss_ratio=cfg.vertex_loss_ratio,
                             aug_cfg=cfg.aug_cfg, aug_hw=aug_hw,
                             head_layout=head_layout,
                             input_layout=input_layout)

    def step_fn(carry):
        st, acc = carry
        k = jax.random.fold_in(jax.random.PRNGKey(13),
                               acc.astype(jnp.int32))
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (batch,), 0, n)
        st, metrics = step(st, data, idx, k2)
        return (st, acc + 1.0 + metrics["loss"].astype(jnp.float32) * 1e-3)

    t = timeit_chained(step_fn, (state, jnp.float32(1.0)), iters)
    return t, aug_hw, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--quick", action="store_true",
                    help="small shapes for a smoke run")
    ap.add_argument("--checkpoint", default=CKPT_PATH,
                    help="flax msgpack weights (assets/duck_ckpt.msgpack)")
    ap.add_argument("--no-stages", dest="stages", action="store_false",
                    default=True, help="skip per-stage/uncertainty timing")
    ap.add_argument("--fused_tail", action="store_true", default=True,
                    help="packed-lattice decoder tail (default: measured "
                         "636 vs 601 poses/s for the plain XLA path with "
                         "trained weights; eval metrics match within noise)")
    ap.add_argument("--no-fused_tail", dest="fused_tail",
                    action="store_false")
    ap.add_argument("--tail_depth", type=int, default=3, choices=(1, 2, 3),
                    help="with --fused_tail: 2 also packs the 2s decoder "
                         "stage, 3 the 4s stage too "
                         "(ops/packed_tail.run_packed_stage)")
    ap.add_argument("--packed_stem", action="store_true", default=False,
                    help="stem conv on the s2d-packed uint8 image "
                         "(models/resnet.py stem='packed4'): the timed "
                         "input is raw uint8, pack+normalize run on "
                         "device inside the program")
    ap.add_argument("--prepacked", action="store_true", default=False,
                    help="with --packed_stem: the host pre-packs to "
                         "[b, h/2, w/2, 12] uint8 (a numpy op at decode "
                         "time); the device only normalizes — isolates "
                         "the on-device s2d transpose cost")
    ap.add_argument("--quant", action="store_true", default=True,
                    help="int8 PTQ on the backbone (ops/quant_conv.py): "
                         "the 2x-rate int8 MXU path. Default on: measured "
                         "778.5 (static, whole backbone) vs 649 float "
                         "poses/s e2e with trained weights; occluded-"
                         "split metrics within noise of float (proj "
                         "-0.12pp / ADD +0.61pp / 5cm5deg -0.25pp, 410 "
                         "images, envelope 512)")
    ap.add_argument("--no-quant", dest="quant", action="store_false")
    ap.add_argument("--quant_stages", default="0,1,2,3",
                    help="comma list of 0-based backbone stages to "
                         "quantize with --quant (default: whole backbone "
                         "— measured 778.5 vs 769.3 for 2,3 under "
                         "static scales)")
    ap.add_argument("--quant_tail", action="store_true", default=False,
                    help="int8 the packed-tail stage convs too (dynamic "
                         "per-image scales only). REFUTED: 513 vs 738 "
                         "poses/s e2e — the int8 2x2 lattice conv is "
                         "slower than bf16 on this backend "
                         "(see ops/packed_tail.run_packed_stage)")
    ap.add_argument("--quant_decoder", action="store_true", default=False,
                    help="int8 the decoder fc/8s convs (models/pvnet.py "
                         "quant_decoder). REFUTED: 727.7 vs 737.5 poses/s "
                         "e2e — at 60x80 the absmax+quantize passes eat "
                         "the int8 conv gain")
    ap.add_argument("--quant_mode", default="static",
                    choices=("dynamic", "static"),
                    help="activation scales: 'static' (default) = "
                         "calibrated scalar per conv — the quantize "
                         "fuses into the producer, no absmax pass; "
                         "measured 769.3 vs 737.5 poses/s over 'dynamic' "
                         "(per-image absmax in-graph) at quant_stages "
                         "2,3. Calibrated on one rendered batch "
                         "(ops/quant_conv.calibrate)")
    ap.add_argument("--bf16", action="store_true", default=True)
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    ap.add_argument("--vote_impl", default="bf16",
                    choices=("xla", "bf16", "pallas"),
                    help="inlier-count implementation (ops/voting."
                         "count_inliers). 'bf16' (default) runs the "
                         "compare-reduce in bfloat16 — winner selection "
                         "only, WLS refine stays f32; accuracy-neutral on "
                         "the occluded split (studies/envelope.md) and "
                         "never slower across a 3x alternating A/B "
                         "(763-781 vs 703-778 poses/s, 2026-08-20). The "
                         "library default stays 'xla' (exact-parity f32) "
                         "for the v2-v6 layers and CPU tests")
    ap.add_argument("--unc_hyp_num", type=int, default=None,
                    help="uncertainty-PnP covariance hypothesis budget "
                         "(VoteParams.uncertainty_hyp_num; default 1024 "
                         "after the 2026-08-20 sweep — accuracy flat "
                         "1024..4096, throughput 762 vs 701 poses/s; the "
                         "reference's 4096 was CUDA-buffer-shaped, ref "
                         "ransac_voting_gpu.py:333); pair with "
                         "tools/envelope_study.py --unc_hyp_nums for the "
                         "accuracy side")
    ap.add_argument("--no-train", dest="train_bench", action="store_false",
                    default=True, help="skip the training-throughput bench")
    ap.add_argument("--train_layout", default="NCHW",
                    choices=("NHWC", "NCHW"),
                    help="training-bench layout (NCHW = channel-major "
                         "everywhere: cm aug emission + cm-input model "
                         "+ cm loss path; see train/loss.py and "
                         "models/resnet.Conv). Default NCHW: measured "
                         "228.9 vs 311.95 ms/step at b16 480x640 "
                         "(tools/bench_train_pieces.py, 2026-08-20)")
    ap.add_argument("--train_batch", type=int, default=32,
                    help="training bench batch. 2026-08-20 knee sweep "
                         "(cm layout, isolated subprocess, 2 runs): b16 "
                         "38-42, b32 50-62, b48 58, b64 57 imgs/s — "
                         "throughput plateaus at b32-48 and b64 still "
                         "fits HBM. Default 32 = the reference recipe "
                         "batch (configs/linemod_train.json). The older "
                         "'b32 slower (25.2)' reading predated the "
                         "channel-major layout")
    ap.add_argument("--train_only", action="store_true",
                    help="internal: run ONLY the training bench and print "
                         "its JSON fragment (spawned as a subprocess by "
                         "the full bench for an isolated measurement)")
    args = ap.parse_args()

    if args.prepacked and not args.packed_stem:
        ap.error("--prepacked requires --packed_stem")

    if args.train_only:
        from pvnet_tpu.utils.cache import enable_compilation_cache
        enable_compilation_cache()
        t_step, thw, tb = bench_train_step(args.train_batch, args.height,
                                           args.width, max(args.iters, 4),
                                           head_layout=args.train_layout,
                                           input_layout=args.train_layout)
        print(json.dumps({"train_steps_per_sec": round(1.0 / t_step, 3),
                          "train_imgs_per_sec": round(tb / t_step, 2),
                          "train_batch": tb, "train_hw": list(thw)}))
        return 0

    if args.quick:
        args.batch, args.height, args.width, args.iters = 2, 128, 128, 3
        args.stages = False
        args.train_bench = False

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline
    from pvnet_tpu.config import LINEMOD_K

    dtype = jnp.bfloat16 if args.bf16 else jnp.float32
    stem = "packed4" if args.packed_stem else "conv7"
    quant_stages = tuple(
        int(s) for s in args.quant_stages.split(",")) if args.quant else ()
    model_kw = dict(ver_dim=18, seg_dim=2, dtype=dtype,
                    head_layout="NCHW", stem=stem,
                    quant_stages=quant_stages,
                    quant_decoder=bool(args.quant and args.quant_decoder))
    model = build_model("resnet18_8s", quant_mode=args.quant_mode,
                        **model_kw)
    if args.packed_stem:
        # checkpoints are conv7-trained: load via a conv7 template, fold
        from pvnet_tpu.models.resnet import fold_stem_params
        m7 = build_model("resnet18_8s", ver_dim=18, seg_dim=2, dtype=dtype,
                         head_layout="NCHW")
        probe = jnp.zeros((1, args.height, args.width, 3), jnp.float32)
        v7, weights_kind = load_weights(m7, probe, args.checkpoint)
        variables = jax.device_put(fold_stem_params(v7))
        image = build_inputs(args.batch, args.height, args.width,
                             uint8=True)
        if args.prepacked:
            arr = np.asarray(image)
            b_, h_, w_, _ = arr.shape
            arr = arr.reshape(b_, h_ // 2, 2, w_ // 2, 2, 3)
            arr = arr.transpose(0, 1, 3, 2, 4, 5).reshape(
                b_, h_ // 2, w_ // 2, 12)
            image = jnp.asarray(arr)
    else:
        image = build_inputs(args.batch, args.height, args.width)
        variables, weights_kind = load_weights(model, image,
                                               args.checkpoint)

    if args.quant and args.quant_mode == "static":
        from pvnet_tpu import pipeline as _pl
        from pvnet_tpu.ops import quant_conv
        calib_model = build_model("resnet18_8s", quant_mode="calibrate",
                                  **model_kw)
        calib_in = (jax.jit(_pl.normalize_packed_u8)(image)
                    if args.packed_stem else image)
        quant = quant_conv.calibrate(calib_model, variables, [calib_in],
                                     train=False)
        variables = dict(variables)
        variables["quant"] = jax.device_put(quant)

    points_3d = np.loadtxt(
        "/root/reference/data/demo/cat_points_3d.txt").astype(np.float32)

    params = VoteParams()   # production envelope (see VoteParams doc)
    if args.unc_hyp_num is not None:
        params = params._replace(uncertainty_hyp_num=args.unc_hyp_num)
    tail_quant = bool(args.quant and args.quant_tail)
    pipeline = make_pose_pipeline(
        model.apply, points_3d, LINEMOD_K, params=params,
        impl=args.vote_impl,
        fused_tail=args.fused_tail, tail_depth=args.tail_depth,
        tail_quant=tail_quant, raw_uint8=args.packed_stem)
    run = jax.jit(pipeline)

    key = jax.random.PRNGKey(1)
    for _ in range(max(args.warmup, 1)):
        pose, kps = run(variables, image, key)
        jax.block_until_ready(pose)

    t0 = time.perf_counter()
    for i in range(args.iters):
        key = jax.random.fold_in(key, i + 1)
        pose, kps = run(variables, image, key)
    jax.block_until_ready(pose)
    dt = time.perf_counter() - t0

    poses_per_sec = args.batch * args.iters / dt
    baseline_fps = 40.0   # PVNet paper, GTX 1080 Ti (external anchor)
    record = {
        "metric": "linemod_poses_per_sec_per_chip",
        "value": round(poses_per_sec, 2),
        "unit": "poses/s",
        "vs_baseline": round(poses_per_sec / baseline_fps, 3),
        "weights": weights_kind,
        "batch": args.batch,
        "fused_tail": bool(args.fused_tail),
        "tail_depth": args.tail_depth if args.fused_tail else 0,
        "packed_stem": bool(args.packed_stem),
        "prepacked": bool(args.prepacked),
        "quant": bool(args.quant),
        "quant_stages": list(quant_stages),
        "quant_tail": tail_quant,
        "quant_decoder": bool(args.quant and args.quant_decoder),
        "quant_mode": args.quant_mode if args.quant else None,
    }

    if args.stages:
        b = args.batch
        # normalized input for the stage decomposition (the pipelines
        # below still take the original `image`, packed-u8 or float)
        image_n = (jax.jit(pl_mod.normalize_packed_u8)(image)
                   if args.packed_stem else image)
        fwd = lambda v, x: pl_mod.predict_fields(model.apply, v, x)

        def fcn_step(img):
            _, vertex = fwd(variables, img)
            return img + vertex.astype(img.dtype).mean() * 1e-6

        t_fwd = timeit_chained(fcn_step, image_n, args.iters)
        mask, vertex = jax.jit(fwd)(variables, image_n)

        def vote_step(carry):
            v, k = carry
            kp = pl_mod.keypoints_from_fields(mask, v, k, params,
                                              impl=args.vote_impl)
            return (v + (kp.mean() * 1e-6).astype(v.dtype),
                    jax.random.fold_in(k, 0))

        t_vote = timeit_chained(vote_step, (vertex, key), args.iters)
        kps0 = jax.jit(lambda m, v, k: pl_mod.keypoints_from_fields(
            m, v, k, params, impl=args.vote_impl))(mask, vertex, key)

        def pnp_step(kp):
            poses = pl_mod.poses_from_keypoints(
                jnp.asarray(points_3d), kp, jnp.asarray(LINEMOD_K))
            return kp + poses[:, 0, 0, None, None] * 1e-6

        t_pnp = timeit_chained(pnp_step, kps0, args.iters)
        record["stage_ms"] = {
            "fcn_forward": round(t_fwd * 1e3, 2),
            "voting": round(t_vote * 1e3, 2),
            "pnp": round(t_pnp * 1e3, 2),
            "sum": round((t_fwd + t_vote + t_pnp) * 1e3, 2),
        }

        if args.fused_tail:
            # Decompose the SHIPPED fused path too (stage_ms above is the
            # plain decoder — round-4 review weak #2): packed tail incl.
            # foreground selection / hypothesis gen / inlier count /
            # argmax+WLS / PnP. Heavy inputs ride the carry (perturbed by
            # timeit_chained) AND are batch-rolled by the accumulator so
            # while-loop LICM can't hoist them (benchlib doc).
            from pvnet_tpu.ops import voting as vt_mod

            def _roll_fg(f, ai):
                return vt_mod.ForegroundSample(
                    *(jnp.roll(t, ai % b, axis=0) for t in f))

            def tail_step(carry):
                img, k, acc = carry
                ai = acc.astype(jnp.int32)
                fg_s = pl_mod.fused_tail_foreground(
                    model.apply, variables, jnp.roll(img, ai % b, axis=0),
                    params.max_num, jax.random.fold_in(key, ai),
                    tail_depth=args.tail_depth, tail_quant=tail_quant)
                return (img, k, acc + 1.0 +
                        fg_s.coords.astype(jnp.float32).mean() * 1e-6)

            t_tail = timeit_chained(
                tail_step, (image_n, key, jnp.float32(1.0)), args.iters)

            fg0 = jax.jit(lambda v, x, k: pl_mod.fused_tail_foreground(
                model.apply, v, x, params.max_num, k,
                tail_depth=args.tail_depth, tail_quant=tail_quant))(
                    variables, image_n, key)

            def hyp_step(carry):
                f, k, acc = carry
                ai = acc.astype(jnp.int32)
                hyps_s = vt_mod.generate_hypotheses(
                    _roll_fg(f, ai), params.hyp_num,
                    jax.random.fold_in(key, ai))
                return (f, k, acc + 1.0 +
                        hyps_s.astype(jnp.float32).mean() * 1e-6)

            t_hyp = timeit_chained(hyp_step, (fg0, key, jnp.float32(1.0)),
                                   args.iters)

            hyps0 = jax.jit(lambda f, k: vt_mod.generate_hypotheses(
                f, params.hyp_num, k))(fg0, key)

            def count_step(carry):
                f, hyps_c, acc = carry
                ai = acc.astype(jnp.int32)
                counts_s = vt_mod.count_inliers(
                    _roll_fg(f, ai), jnp.roll(hyps_c, ai % b, axis=0),
                    params.inlier_thresh, impl=args.vote_impl)
                return (f, hyps_c, acc + 1.0 +
                        counts_s.astype(jnp.float32).mean() * 1e-6)

            t_count = timeit_chained(
                count_step, (fg0, hyps0, jnp.float32(1.0)), args.iters)

            counts0 = jax.jit(lambda f, h: vt_mod.count_inliers(
                f, h, params.inlier_thresh, impl=args.vote_impl))(
                    fg0, hyps0)

            def wls_step(carry):
                f, hyps_c, counts_c, acc = carry
                ai = acc.astype(jnp.int32)
                kps_s = vt_mod.vote_argmax_refine(
                    _roll_fg(f, ai), jnp.roll(hyps_c, ai % b, axis=0),
                    jnp.roll(counts_c, ai % b, axis=0),
                    params.inlier_thresh, params.min_num)
                return (f, hyps_c, counts_c,
                        acc + 1.0 + kps_s.mean() * 1e-6)

            t_wls = timeit_chained(
                wls_step, (fg0, hyps0, counts0, jnp.float32(1.0)),
                args.iters)

            record["fused_stage_ms"] = {
                "tail_fg": round(t_tail * 1e3, 2),
                "hypgen": round(t_hyp * 1e3, 2),
                "count": round(t_count * 1e3, 2),
                "wls_argmax": round(t_wls * 1e3, 2),
                "pnp": round(t_pnp * 1e3, 2),
                "sum": round((t_tail + t_hyp + t_count + t_wls + t_pnp)
                             * 1e3, 2),
            }

        # The stages above decompose the PLAIN (full-resolution decoder)
        # path; time that same path e2e so the sum is checkable against a
        # real pipeline number (the headline may use the fused tail, which
        # has no fcn/vote boundary to instrument).
        plain = jax.jit(make_pose_pipeline(
            model.apply, points_3d, LINEMOD_K, params=params,
            fused_tail=False, raw_uint8=args.packed_stem))
        kp = jax.random.PRNGKey(5)
        for _ in range(2):
            pose_p, _ = plain(variables, image, kp)
            jax.block_until_ready(pose_p)
        t0p = time.perf_counter()
        for i in range(args.iters):
            kp = jax.random.fold_in(kp, i + 1)
            pose_p, _ = plain(variables, image, kp)
        jax.block_until_ready(pose_p)
        t_plain = (time.perf_counter() - t0p) / args.iters
        record["plain_ms_per_batch"] = round(t_plain * 1e3, 2)
        record["plain_poses_per_sec"] = round(b / t_plain, 2)

        # uncertainty PnP e2e — same packed-tail config as the main
        # pipeline (round-2 review: running it through the plain decoder
        # left ~15-20% on the table; pipeline.run_fused supports it)
        unc = jax.jit(make_pose_pipeline(
            model.apply, points_3d, LINEMOD_K, params=params,
            impl=args.vote_impl,
            uncertainty=True, fused_tail=args.fused_tail,
            tail_depth=args.tail_depth, tail_quant=tail_quant,
            raw_uint8=args.packed_stem))

        # carry a float accumulator: it data-depends on each step's output
        # (chains the scan) and is perturbable by timeit_chained even when
        # the image is uint8 (keys and uint8 leaves pass _perturb
        # unchanged — a (uint8, key) carry would re-memoize). The image
        # fed to the pipeline must ALSO depend on the accumulator (dynamic
        # batch roll) or XLA's while-loop LICM hoists the whole FCN
        # forward out of the scan and reports fcn/iters as the stage cost.
        def unc_step(carry):
            img, k, acc = carry
            kk = jax.random.fold_in(k, acc.astype(jnp.int32))
            rolled = jnp.roll(img, acc.astype(jnp.int32) % b, axis=0)
            pose_u, _ = unc(variables, rolled, kk)
            return (img, k,
                    acc + 1.0 + pose_u.astype(jnp.float32).mean() * 1e-3)

        t_unc = timeit_chained(unc_step, (image, key, jnp.float32(1.0)),
                               args.iters)
        record["uncertainty_poses_per_sec"] = round(b / t_unc, 2)

    if args.train_bench:
        # Run the training bench in a SUBPROCESS: measured in-process
        # after the inference stages it reads 2.33 steps/s vs 3.38 in a
        # fresh process (b16 480x640, 2026-08-20) — and deleting every
        # big local + gc.collect() does NOT recover it, so the
        # contamination lives below the Python layer (client/tunnel
        # state, not HBM). Isolation is the honest measurement.
        import subprocess
        cmd = [sys.executable, os.path.abspath(__file__), "--train_only",
               "--train_batch", str(args.train_batch),
               "--train_layout", args.train_layout,
               "--height", str(args.height), "--width", str(args.width),
               "--iters", str(args.iters)]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=1800)
        frag = [ln for ln in out.stdout.splitlines()
                if ln.startswith("{")]
        if frag:
            record.update(json.loads(frag[-1]))
        else:
            record["train_bench_error"] = out.stderr[-400:]

    print(json.dumps(record))
    return 0


if __name__ == "__main__":
    sys.exit(main())
