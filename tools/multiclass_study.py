"""Multi-class training + eval study: fuse-style composites, multi-class
voting, per-class evaluators, symmetric ADD-S in anger.

The reference exercises its multi-class voting layer
(ref ransac_voting_gpu.py:10-97) through fuse-set training and scores
symmetric classes (eggbox/glue) with ADD-S
(ref evaluation_utils.py:119-130,155-158 + config.py:70). This study runs
the same two code paths end-to-end on synthetic data: 3 object classes
(duck = asymmetric, box = 90-degree rotation-symmetric -> ADD-S,
cylinder = axially symmetric shape with a texture stripe) composited into
every frame with class-labeled masks, a seg_dim = n_cls+1 PVNet trained on
the shared multi-class vertex field
(data/vertex.compute_vertex_targets_multiclass), then evaluated through
ops/voting.ransac_voting_multiclass with one Evaluator per class.

  python tools/multiclass_study.py --train_images 192 --epochs 60
  python tools/multiclass_study.py --quick        # tiny smoke (CPU-able)

Prints one JSON row per class: proj / ADD(-S) / 5cm5deg + seg accuracy.
"""
from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_class_set():
    """[(name, mesh, symmetric)] — class c = index + 1 in the masks."""
    from pvnet_tpu.data.synthetic import (make_box_mesh, make_cylinder_mesh,
                                          make_duck_mesh)
    return [("duck", make_duck_mesh(), False),
            ("box", make_box_mesh(), True),
            ("cyl", make_cylinder_mesh(), False)]


def class_meta(name, mesh, symmetric):
    """ObjectMeta with FPS+center keypoints and the exact max-pairwise
    diameter (ref data_utils.py:111-118 semantics)."""
    from pvnet_tpu.eval.evaluator import ObjectMeta
    from pvnet_tpu.ops.fps import farthest_point_sampling
    kps = farthest_point_sampling(mesh.vertices, 8, init_center=True)
    pts3d = np.concatenate([kps, mesh.vertices.mean(0, keepdims=True)], 0)
    v = mesh.vertices
    d2 = ((v[None] - v[:, None]) ** 2).sum(-1)
    return ObjectMeta(points_3d=pts3d.astype(np.float32),
                      model_pts=v.astype(np.float32),
                      diameter=float(np.sqrt(d2.max())),
                      symmetric=symmetric, name=name)


def sample_scene(classes, rng, K, h, w):
    """Pose every class into the same frame, laterally separated so each
    object is mostly visible (fuse-style): returns [(mesh, pose [3,4])]."""
    from pvnet_tpu.data.synthetic import sample_object_pose
    offsets = [(-0.11, -0.05), (0.11, -0.02), (0.0, 0.09)]
    order = rng.permutation(len(classes))
    poses = [None] * len(classes)
    for slot, ci in enumerate(order):
        pose = sample_object_pose(rng, z_range=(0.55, 0.85))
        ox, oy = offsets[slot]
        pose[:, 3] = [ox + rng.uniform(-0.02, 0.02),
                      oy + rng.uniform(-0.02, 0.02),
                      pose[2, 3]]
        poses[ci] = pose
    return [(classes[ci][1], poses[ci]) for ci in range(len(classes))]


def generate_split(classes, metas, n, K, h, w, seed):
    """(images u8 [n,h,w,3], masks u8 [n,h,w], hcoords [n,C,k,3] f32,
    poses [n,C,3,4] f32)."""
    from pvnet_tpu.data.synthetic import render_multiclass_view
    from pvnet_tpu.data.pose_transforms import project_np
    rng = np.random.RandomState(seed)
    C, k = len(classes), metas[0].points_3d.shape[0]
    images = np.empty((n, h, w, 3), np.uint8)
    masks = np.empty((n, h, w), np.uint8)
    hcoords = np.empty((n, C, k, 3), np.float32)
    poses = np.empty((n, C, 3, 4), np.float32)
    for i in range(n):
        mp = sample_scene(classes, rng, K, h, w)
        rgb, label = render_multiclass_view(mp, K, h, w, rng)
        images[i], masks[i] = rgb, label
        for c, (_, pose) in enumerate(mp):
            p2d = project_np(metas[c].points_3d, pose, K)
            hcoords[i, c] = np.concatenate(
                [p2d, np.ones((k, 1), np.float32)], axis=1)
            poses[i, c] = pose
    return images, masks, hcoords, poses


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train_images", type=int, default=192)
    ap.add_argument("--test_images", type=int, default=64)
    ap.add_argument("--height", type=int, default=360)
    ap.add_argument("--width", type=int, default=480)
    ap.add_argument("--epochs", type=int, default=60)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--out_dir", default="data/multiclass_study")
    ap.add_argument("--quick", action="store_true",
                    help="tiny shapes (smoke; metrics meaningless)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (the axon TPU plugin "
                         "overrides JAX_PLATFORMS; this uses the config "
                         "API, which wins)")
    args = ap.parse_args()
    if args.quick:
        args.train_images, args.test_images = 8, 4
        args.height, args.width = 120, 160
        args.epochs, args.batch = 2, 4

    from pvnet_tpu.utils.cache import enable_compilation_cache
    enable_compilation_cache()
    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from flax import serialization
    from pvnet_tpu.config import (IMAGENET_MEAN, IMAGENET_STD, LINEMOD_K,
                                  TrainConfig)
    from pvnet_tpu.eval.evaluator import Evaluator
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.ops import voting
    from pvnet_tpu.train import trainer

    classes = build_class_set()
    metas = [class_meta(*c) for c in classes]
    C = len(classes)
    h, w = args.height, args.width
    K = LINEMOD_K.copy()
    K[0] *= w / 640.0
    K[1] *= h / 480.0

    print(f"generating {args.train_images}+{args.test_images} composite "
          f"frames ({h}x{w}, classes: "
          f"{[m.name + ('*' if m.symmetric else '') for m in metas]}; "
          "* = symmetric, scored with ADD-S) ...", flush=True)
    tr_img, tr_mask, tr_hc, _ = generate_split(
        classes, metas, args.train_images, K, h, w, seed=0)
    te_img, te_mask, te_hc, te_poses = generate_split(
        classes, metas, args.test_images, K, h, w, seed=1)

    vn = metas[0].points_3d.shape[0]
    cfg = TrainConfig(model_name="multiclass_study", lr=args.lr,
                      train_batch_size=args.batch)
    model = build_model("resnet18_8s", ver_dim=vn * 2, seg_dim=C + 1,
                        dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    state = trainer.create_train_state(model, cfg, (1, h, w, 3), key)

    data = {"image": jnp.asarray(tr_img), "mask": jnp.asarray(tr_mask),
            "hcoords": jnp.asarray(tr_hc)}
    mean = jnp.asarray(IMAGENET_MEAN)
    std = jnp.asarray(IMAGENET_STD)

    @jax.jit
    def step(state, idx):
        img = data["image"][idx].astype(jnp.float32) / 255.0
        batch = {
            "image": (img - mean) / std,
            "mask": data["mask"][idx].astype(jnp.int32),
            "hcoords": data["hcoords"][idx],
        }
        batch["vertex_weights"] = (batch["mask"] > 0)[..., None].astype(
            jnp.float32)
        return trainer.train_step(state, batch,
                                  vertex_loss_ratio=cfg.vertex_loss_ratio)

    n = args.train_images
    steps_per_epoch = max(n // args.batch, 1)
    rng = np.random.RandomState(7)
    t0 = time.time()
    for epoch in range(args.epochs):
        state = trainer.set_learning_rate(
            state, trainer.lr_for_epoch(cfg, epoch))
        perm = rng.permutation(n)
        for s in range(steps_per_epoch):
            idx = jnp.asarray(perm[s * args.batch:(s + 1) * args.batch]
                              [:args.batch])
            if idx.shape[0] < args.batch:
                break
            state, metrics = step(state, idx)
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            print(f"epoch {epoch}: loss {float(metrics['loss']):.4f} "
                  f"(seg {float(metrics['seg_loss']):.4f} "
                  f"ver {float(metrics['ver_loss']):.4f}) "
                  f"[{time.time() - t0:.0f}s]", flush=True)

    # ---- eval: multi-class voting + per-class evaluators ----
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def eval_fwd(img_u8, rngkey):
        img = (img_u8.astype(jnp.float32) / 255.0 - mean) / std
        seg, ver = model.apply(variables, img, train=False)
        labels = jnp.argmax(seg, axis=-1)
        b = img.shape[0]
        vertex = ver.reshape(b, h, w, vn, 2)
        kps = voting.ransac_voting_multiclass(
            labels, vertex, rngkey, class_num=C + 1,
            hyp_num=512, max_num=512)
        return labels, kps

    evaluators = [Evaluator(m) for m in metas]
    eb = min(args.test_images, 16)
    accs = []
    for s0 in range(0, args.test_images, eb):
        sl = slice(s0, min(s0 + eb, args.test_images))
        labels, kps = eval_fwd(jnp.asarray(te_img[sl]),
                               jax.random.fold_in(key, 999 + s0))
        accs.append(np.mean(np.asarray(labels) == te_mask[sl]))
        kps = np.asarray(kps)                      # [b, C, vn, 2]
        bsz = kps.shape[0]
        for c in range(C):
            Ks = np.broadcast_to(K.astype(np.float32), (bsz, 3, 3))
            evaluators[c].evaluate_batch(kps[:, c], te_poses[sl, c], Ks)

    os.makedirs(args.out_dir, exist_ok=True)
    with open(os.path.join(args.out_dir, "params.msgpack"), "wb") as f:
        f.write(serialization.to_bytes(
            {"params": state.params, "batch_stats": state.batch_stats}))

    rows = []
    for c, ev in enumerate(evaluators):
        proj, add, cm = ev.average_precision(verbose=False)
        rows.append({"class": metas[c].name,
                     "symmetric": metas[c].symmetric,
                     "metric": "ADD-S" if metas[c].symmetric else "ADD",
                     "proj": round(proj, 4), "add": round(add, 4),
                     "cm5deg5": round(cm, 4)})
    summary = {"seg_accuracy": round(float(np.mean(accs)), 4),
               "train_images": args.train_images,
               "test_images": args.test_images,
               "epochs": args.epochs, "hw": [h, w], "rows": rows}
    for r in rows:
        print(json.dumps(r), flush=True)
    print(json.dumps({"seg_accuracy": summary["seg_accuracy"]}))
    with open(os.path.join(args.out_dir, "metrics.json"), "w") as f:
        json.dump(summary, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
