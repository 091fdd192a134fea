"""Per-piece timing of the PRODUCTION fused pipeline (packed tail + int8).

bench.py's stage_ms decomposes the plain full-resolution path; the headline
number runs the fused packed-tail path whose pieces have different
boundaries (backbone-to-8s, packed tail, packed selection, voting-from-fg,
PnP). This tool times those pieces with the chained harness so the
production budget is attributable. Run one piece per invocation if tunnel
compiles are slow (they cache):

  python tools/bench_fused_pieces.py --pieces bb8
  python tools/bench_fused_pieces.py --pieces tail,sel,vote,pnp,e2e

Every heavy input is derived from the scan carry (dynamic batch roll) so
XLA's loop-invariant code motion cannot hoist it (CLAUDE.md timing rules).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=8)
    ap.add_argument("--pieces", default="bb8,tail,sel,vote,pnp,e2e",
                    help="comma subset of bb8,tail,sel,vote,pnp,e2e")
    ap.add_argument("--tail_depth", type=int, default=3, choices=(1, 2, 3))
    ap.add_argument("--no-quant", dest="quant", action="store_false",
                    default=True)
    ap.add_argument("--quant_stages", default="0,1,2,3")
    ap.add_argument("--quant_mode", default="static")
    ap.add_argument("--hyp_num", type=int, default=512)
    ap.add_argument("--max_num", type=int, default=512)
    args = ap.parse_args()
    pieces = set(args.pieces.split(","))

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.config import LINEMOD_K
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.ops import packed_tail, voting
    from pvnet_tpu.utils.benchlib import timeit_chained
    from bench import build_inputs, load_weights, CKPT_PATH

    b, h, w = args.batch, args.height, args.width
    qs = (tuple(int(s) for s in args.quant_stages.split(","))
          if args.quant else ())
    model_kw = dict(ver_dim=18, seg_dim=2, dtype=jnp.bfloat16,
                    head_layout="NCHW", quant_stages=qs)
    model = build_model("resnet18_8s", quant_mode=args.quant_mode,
                        **model_kw)
    image = build_inputs(b, h, w)
    variables, kind = load_weights(model, image, CKPT_PATH)
    if args.quant and args.quant_mode == "static":
        from pvnet_tpu.ops import quant_conv
        calib_model = build_model("resnet18_8s", quant_mode="calibrate",
                                  **model_kw)
        quant = quant_conv.calibrate(calib_model, variables, [image],
                                     train=False)
        variables = dict(variables)
        variables["quant"] = jax.device_put(quant)
    print(f"weights={kind} b={b} {h}x{w} quant={qs} "
          f"mode={args.quant_mode} tail_depth={args.tail_depth}",
          flush=True)

    key = jax.random.PRNGKey(3)
    points_3d = np.loadtxt(
        "/root/reference/data/demo/cat_points_3d.txt").astype(np.float32)
    results = {}

    def roll(x, acc):
        return jnp.roll(x, acc.astype(jnp.int32) % b, axis=0)

    apply_fn = model.apply
    if args.tail_depth >= 3:
        bb = lambda img: apply_fn(variables, img, train=False,
                                  return_8s_features=True)
        tail_fn = lambda f8, f4, f2, img: \
            packed_tail.packed_tail_deep3_from_variables(
                variables, f8, f4, f2, img, dtype=jnp.bfloat16)
    elif args.tail_depth == 2:
        bb = lambda img: apply_fn(variables, img, train=False,
                                  return_4s_features=True)
        tail_fn = lambda f4, f2, img: \
            packed_tail.packed_tail_deep_from_variables(
                variables, f4, f2, img, dtype=jnp.bfloat16)
    else:
        bb = lambda img: (apply_fn(variables, img, train=False,
                                   return_2s_features=True),)
        tail_fn = lambda fm, img: packed_tail.packed_tail_from_variables(
            variables, fm, img, dtype=jnp.bfloat16)

    if "bb8" in pieces:
        def bb8_step(img):
            outs = bb(img)
            s = sum(o.astype(jnp.float32).mean() for o in outs)
            return img + s.astype(img.dtype) * 1e-6
        results["bb8"] = timeit_chained(bb8_step, image, args.iters)
        print(f"bb8 (backbone+decoder-to-{8 // (2 ** (3 - args.tail_depth))}"
              f"s): {results['bb8'] * 1e3:.2f} ms", flush=True)

    need_mid = pieces & {"tail", "sel", "vote", "pnp"}
    if need_mid:
        outs = jax.jit(bb)(image)
        outs = jax.block_until_ready(outs)

    if "tail" in pieces:
        def tail_step(carry):
            acc, = carry
            rolled = [roll(o, acc) for o in outs]
            packed, fgcnt = tail_fn(*rolled, roll(image, acc))
            return (acc + 1.0
                    + packed.astype(jnp.float32).mean() * 1e-6
                    + fgcnt.astype(jnp.float32).mean() * 1e-6,)
        results["tail"] = timeit_chained(
            tail_step, (jnp.float32(1.0),), args.iters)
        print(f"tail (packed decoder d{args.tail_depth}): "
              f"{results['tail'] * 1e3:.2f} ms", flush=True)

    need_fg = pieces & {"sel", "vote", "pnp"}
    if need_fg:
        packed, fgcnt = jax.jit(lambda: tail_fn(*outs, image))()
        packed = jax.block_until_ready(packed)

    if "sel" in pieces:
        def sel_step(carry):
            acc, k = carry
            fg = voting.sample_foreground_packed(
                roll(packed, acc), roll(fgcnt, acc), args.max_num, k)
            return (acc + 1.0 + fg.coords.mean() * 1e-6,
                    jax.random.fold_in(k, 1))
        results["sel"] = timeit_chained(
            sel_step, (jnp.float32(1.0), key), args.iters)
        print(f"sel (packed foreground select): "
              f"{results['sel'] * 1e3:.2f} ms", flush=True)

    if pieces & {"vote", "pnp"}:
        fg0 = jax.jit(lambda k: voting.sample_foreground_packed(
            packed, fgcnt, args.max_num, k))(key)
        fg0 = jax.block_until_ready(fg0)

    if "vote" in pieces:
        def vote_step(carry):
            acc, k = carry
            fg = jax.tree.map(lambda x: roll(x, acc), fg0)
            kps = voting.ransac_voting_v3_from_fg(fg, k,
                                                  hyp_num=args.hyp_num)
            return (acc + 1.0 + kps.mean() * 1e-6, jax.random.fold_in(k, 1))
        results["vote"] = timeit_chained(
            vote_step, (jnp.float32(1.0), key), args.iters)
        print(f"vote (v3 from fg, hn={args.hyp_num}): "
              f"{results['vote'] * 1e3:.2f} ms", flush=True)

    if "pnp" in pieces:
        kps0 = jax.jit(lambda k: voting.ransac_voting_v3_from_fg(
            fg0, k, hyp_num=args.hyp_num))(key)
        kps0 = jax.block_until_ready(kps0)

        def pnp_step(kps):
            poses = pl_mod.poses_from_keypoints(
                jnp.asarray(points_3d), kps, jnp.asarray(LINEMOD_K))
            return kps + poses[:, 0, 0, None, None] * 1e-6
        results["pnp"] = timeit_chained(pnp_step, kps0, args.iters)
        print(f"pnp: {results['pnp'] * 1e3:.2f} ms", flush=True)

    if "e2e" in pieces:
        run = pl_mod.make_pose_pipeline(
            apply_fn, points_3d, LINEMOD_K,
            params=pl_mod.VoteParams(hyp_num=args.hyp_num,
                                     max_num=args.max_num),
            fused_tail=True, tail_depth=args.tail_depth)

        def e2e_step(carry):
            acc, k = carry
            pose, _ = run(variables, roll(image, acc), k)
            return (acc + 1.0 + pose.astype(jnp.float32).mean() * 1e-3,
                    jax.random.fold_in(k, 1))
        results["e2e"] = timeit_chained(
            e2e_step, (jnp.float32(1.0), key), args.iters)
        print(f"e2e (fused): {results['e2e'] * 1e3:.2f} ms", flush=True)

    if results:
        known = [k for k in ("bb8", "tail", "sel", "vote", "pnp")
                 if k in results]
        if len(known) > 1:
            s = sum(results[k] for k in known)
            print(f"sum({'+'.join(known)}) = {s * 1e3:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
