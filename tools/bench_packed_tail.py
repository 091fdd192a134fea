"""Per-piece timing of the packed inference tail (ops/packed_tail.py).

  python tools/bench_packed_tail.py [--batch 16]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np



from pvnet_tpu.utils.benchlib import timeit_chained


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--pieces", default="fm,up,img,conv,full,sel",
                    help="comma subset of fm,up,img,conv,full,sel,"
                         "fm4,fm8,stage2,full2,full3 — run "
                         "one piece per invocation to amortize tunnel "
                         "compiles via the compilation cache")
    args = ap.parse_args()
    pieces = set(args.pieces.split(","))

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.ops import packed_tail as pt
    from pvnet_tpu.ops import voting

    b = args.batch
    rng = np.random.RandomState(0)
    model = build_model("resnet18_8s", ver_dim=18, dtype=jnp.bfloat16)
    image = jnp.asarray(rng.randn(b, 480, 640, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), image[:1], train=False)

    if "fm" in pieces:
        def fm_step(img):
            fm = model.apply(variables, img, train=False,
                             return_2s_features=True)
            return img + fm.astype(jnp.float32).mean() * 1e-12

        t = timeit_chained(fm_step, image, args.iters)
        print(f"fcn_to_2s:            {t*1e3:8.2f} ms", flush=True)

    need_fm = pieces & {"up", "conv", "sel"}
    fm = jax.jit(lambda v, x: model.apply(
        v, x, train=False, return_2s_features=True))(variables, image) \
        if need_fm else None
    bn = variables["batch_stats"]["BatchNorm_4"]
    tp = jax.jit(lambda v: pt.fold_packed_tail(
        v["params"]["Conv_4"]["kernel"], v["params"]["BatchNorm_4"]["scale"],
        v["params"]["BatchNorm_4"]["bias"], bn["mean"], bn["var"],
        v["params"]["Conv_5"]["kernel"], v["params"]["Conv_5"].get("bias"),
        480, 640, 240, 320))(variables)

    if "up" in pieces:
        def up_step(f):
            u = pt.phase_upsample_packed(f, tp.ah, tp.aw)
            return f + u.astype(f.dtype).mean() * 1e-12

        t_up = timeit_chained(up_step, fm, args.iters)
        print(f"phase_upsample:       {t_up*1e3:8.2f} ms", flush=True)

    up = jax.jit(lambda f: pt.phase_upsample_packed(f, tp.ah, tp.aw))(fm) \
        if "conv" in pieces else None

    if "img" in pieces:
        def img_step(x):
            xp = pt.pack_image(x)
            return x + xp.astype(x.dtype).mean() * 1e-12

        t_img = timeit_chained(img_step, image, args.iters)
        print(f"pack_image:           {t_img*1e3:8.2f} ms", flush=True)

    def conv_step(u):
        y = jax.lax.conv_general_dilated(
            u, tp.w_fm.astype(u.dtype), (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        # rgb term: direct stride-2 conv over the image (w_im [4,4,3,4c])
        y = y + jax.lax.conv_general_dilated(
            image.astype(u.dtype), tp.w_im.astype(u.dtype), (2, 2),
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        y = y * tp.scale4 + tp.bias4
        y = jnp.where(y > 0, y, 0.1 * y)
        pk = (y.astype(jnp.bfloat16) @ tp.w_head4.astype(jnp.bfloat16))
        return u + pk.astype(u.dtype).mean() * 1e-12

    if "conv" in pieces:
        t_conv = timeit_chained(conv_step, up, args.iters)
        print(f"packed_convs+head:    {t_conv*1e3:8.2f} ms", flush=True)

    def full_step(x):
        f = model.apply(variables, x, train=False, return_2s_features=True)
        packed, fgcnt = pt.packed_tail_from_variables(variables, f, x)
        return x + packed.astype(jnp.float32).mean() * 1e-12

    if "full" in pieces:
        t_full = timeit_chained(full_step, image, args.iters)
        print(f"full_packed_forward:  {t_full*1e3:8.2f} ms", flush=True)

    if "sel" in pieces:
        packed, fgcnt = jax.jit(
            lambda v, f, x: pt.packed_tail_from_variables(v, f, x))(
            variables, fm, image)

    if "sel" in pieces:
        def sel_step(carry):
            pk, k = carry
            fg = voting.sample_foreground_packed(pk, fgcnt, 512, k)
            return (pk + (fg.coords.mean() * 1e-12).astype(pk.dtype),
                    jax.random.fold_in(k, 0))

        t_sel = timeit_chained(sel_step, (packed, jax.random.PRNGKey(0)),
                               args.iters)
        print(f"packed_selection:     {t_sel*1e3:8.2f} ms", flush=True)

    # --- deep packed decoder pieces (tail_depth 2/3) ---
    if "fm4" in pieces:
        def fm4_step(img):
            f4, _ = model.apply(variables, img, train=False,
                                return_4s_features=True)
            return img + f4.astype(jnp.float32).mean() * 1e-12

        t = timeit_chained(fm4_step, image, args.iters)
        print(f"fcn_to_4s:            {t*1e3:8.2f} ms", flush=True)

    if "fm8" in pieces:
        def fm8_step(img):
            f8, _, _ = model.apply(variables, img, train=False,
                                   return_8s_features=True)
            return img + f8.astype(jnp.float32).mean() * 1e-12

        t = timeit_chained(fm8_step, image, args.iters)
        print(f"fcn_to_8s:            {t*1e3:8.2f} ms", flush=True)

    if "stage2" in pieces:
        fm4, x2s = jax.jit(lambda v, x: model.apply(
            v, x, train=False, return_4s_features=True))(variables, image)
        bs = variables["batch_stats"]
        cp = jax.jit(lambda v: pt.fold_packed_stage(
            v["params"]["Conv_3"]["kernel"],
            v["params"]["BatchNorm_3"]["scale"],
            v["params"]["BatchNorm_3"]["bias"],
            bs["BatchNorm_3"]["mean"], bs["BatchNorm_3"]["var"],
            fm4.shape[-1], 240, 320))(variables)

        def st2_step(f):
            y = pt.run_packed_stage(f, x2s, cp)
            return f + y.astype(f.dtype).mean() * 1e-12

        t = timeit_chained(st2_step, fm4, args.iters)
        print(f"packed_stage_2s:      {t*1e3:8.2f} ms", flush=True)

    if "full2" in pieces:
        def full2_step(x):
            f4, x2 = model.apply(variables, x, train=False,
                                 return_4s_features=True)
            packed2, _ = pt.packed_tail_deep_from_variables(
                variables, f4, x2, x)
            return x + packed2.astype(jnp.float32).mean() * 1e-12

        t = timeit_chained(full2_step, image, args.iters)
        print(f"full_packed_depth2:   {t*1e3:8.2f} ms", flush=True)

    if "full3" in pieces:
        def full3_step(x):
            f8, x4, x2 = model.apply(variables, x, train=False,
                                     return_8s_features=True)
            packed3, _ = pt.packed_tail_deep3_from_variables(
                variables, f8, x4, x2, x)
            return x + packed3.astype(jnp.float32).mean() * 1e-12

        t = timeit_chained(full3_step, image, args.iters)
        print(f"full_packed_depth3:   {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
