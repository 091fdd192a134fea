"""Multi-class voting + symmetric ADD-S end-to-end slices (CPU, tiny).

Covers the two reference code paths round-2 review flagged as never run in
anger: the multi-class voting loop (ref ransac_voting_gpu.py:10-97) and
the symmetric-class ADD-S branch (ref evaluation_utils.py:119-130,155-158
+ config.py:70). tools/multiclass_study.py runs the full trained study;
these tests pin each stage with analytically known answers.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu.data.pose_transforms import project_np
from pvnet_tpu.data.synthetic import (make_box_mesh, make_cylinder_mesh,
                                      make_duck_mesh,
                                      render_multiclass_view)
from pvnet_tpu.data.vertex import compute_vertex_targets_multiclass
from pvnet_tpu.ops import voting

sys.path.insert(0, __file__.rsplit("/", 2)[0] + "/tools")
from multiclass_study import build_class_set, class_meta, sample_scene

H, W = 120, 160


def scaled_K():
    K = LINEMOD_K.copy()
    K[0] *= W / 640.0
    K[1] *= H / 480.0
    return K


@pytest.fixture(scope="module")
def scene():
    classes = build_class_set()
    metas = [class_meta(*c) for c in classes]
    rng = np.random.RandomState(3)
    K = scaled_K()
    mp = sample_scene(classes, rng, K, H, W)
    rgb, label = render_multiclass_view(mp, K, H, W, rng)
    return classes, metas, mp, rgb, label, K


def test_composite_has_all_classes(scene):
    _, _, _, rgb, label, _ = scene
    present = set(np.unique(label))
    assert {0, 1, 2, 3} <= present, present
    # each object visible with a non-trivial footprint
    for c in (1, 2, 3):
        assert (label == c).sum() > 40, (c, (label == c).sum())


def test_multiclass_gt_field_voting_recovers_keypoints(scene):
    """Clean per-class GT fields -> voted keypoints match projections."""
    classes, metas, mp, _, label, K = scene
    C = len(classes)
    k = metas[0].points_3d.shape[0]
    hc = np.empty((1, C, k, 3), np.float32)
    for c, (_, pose) in enumerate(mp):
        p2d = project_np(metas[c].points_3d, pose, K)
        hc[0, c] = np.concatenate([p2d, np.ones((k, 1), np.float32)], 1)
    vertex = compute_vertex_targets_multiclass(
        jnp.asarray(label[None].astype(np.int32)), jnp.asarray(hc))
    vertex = np.asarray(vertex).reshape(1, H, W, k, 2)
    kps = voting.ransac_voting_multiclass(
        jnp.asarray(label[None].astype(np.int32)), jnp.asarray(vertex),
        jax.random.PRNGKey(0), class_num=C + 1, hyp_num=256, max_num=256)
    kps = np.asarray(kps)          # [1, C, k, 2]
    for c in range(C):
        err = np.linalg.norm(kps[0, c] - hc[0, c, :, :2], axis=-1)
        assert np.median(err) < 1.0, (metas[c].name, err)


def test_multiclass_train_step_runs(scene):
    """One optimizer step on a multi-class batch: finite loss, the
    hcoords-ndim dispatch in trainer._batch_vertex picks the multiclass
    target builder."""
    from pvnet_tpu.config import TrainConfig
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.train import trainer
    classes, metas, mp, rgb, label, K = scene
    C = len(classes)
    k = metas[0].points_3d.shape[0]
    model = build_model("resnet18_8s", ver_dim=k * 2, seg_dim=C + 1)
    cfg = TrainConfig(model_name="t", train_batch_size=1)
    state = trainer.create_train_state(model, cfg, (1, H, W, 3),
                                       jax.random.PRNGKey(0))
    hc = np.empty((1, C, k, 3), np.float32)
    for c, (_, pose) in enumerate(mp):
        p2d = project_np(metas[c].points_3d, pose, K)
        hc[0, c] = np.concatenate([p2d, np.ones((k, 1), np.float32)], 1)
    batch = {
        "image": jnp.asarray(rgb[None].astype(np.float32) / 255.0),
        "mask": jnp.asarray(label[None].astype(np.int32)),
        "hcoords": jnp.asarray(hc),
        "vertex_weights": jnp.asarray(
            (label[None] > 0)[..., None].astype(np.float32)),
    }
    state2, metrics = jax.jit(trainer.train_step)(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params,
        state2.params)
    assert max(jax.tree_util.tree_leaves(d)) > 0


def test_multiclass_pose_pipeline_api(scene):
    """pipeline.make_multiclass_pose_pipeline on GT fields: one jitted
    program emits per-class poses that reproduce the GT poses."""
    from pvnet_tpu import pipeline as pl_mod
    classes, metas, mp, _, label, K = scene
    C = len(classes)
    k = metas[0].points_3d.shape[0]
    hc = np.empty((1, C, k, 3), np.float32)
    poses_gt = np.empty((C, 3, 4), np.float32)
    for c, (_, pose) in enumerate(mp):
        p2d = project_np(metas[c].points_3d, pose, K)
        hc[0, c] = np.concatenate([p2d, np.ones((k, 1), np.float32)], 1)
        poses_gt[c] = pose
    vertex = compute_vertex_targets_multiclass(
        jnp.asarray(label[None].astype(np.int32)), jnp.asarray(hc))
    vertex = np.asarray(vertex)

    # a fake apply_fn returning GT logits/fields (model-free API test)
    onehot = jax.nn.one_hot(label[None].astype(np.int32), C + 1) * 10.0

    def apply_fn(variables, image, train=False):
        return onehot, jnp.asarray(vertex)

    pts = np.stack([m.points_3d for m in metas])
    run = jax.jit(pl_mod.make_multiclass_pose_pipeline(
        apply_fn, pts, K, params=pl_mod.VoteParams(hyp_num=256,
                                                   max_num=256)))
    poses, kps = run({}, jnp.zeros((1, H, W, 3)), jax.random.PRNGKey(2))
    poses = np.asarray(poses)[0]          # [C, 3, 4]
    assert poses.shape == (C, 3, 4)
    for c in range(C):
        # rotation within a few degrees, translation within ~1 cm
        cos = (np.trace(poses[c, :, :3].T @ poses_gt[c, :, :3]) - 1) / 2
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        assert ang < 5.0, (metas[c].name, ang)
        assert np.linalg.norm(poses[c, :, 3] - poses_gt[c, :, 3]) < 0.02, \
            metas[c].name


def test_symmetric_adds_branch(scene):
    """A box pose rotated by its own 90-degree symmetry: plain ADD fails,
    ADD-S passes — the branch the symmetric flag selects
    (ref evaluation_utils.py:119-130,155-158)."""
    from pvnet_tpu.eval import metrics as M
    classes, metas, _, _, _, K = scene
    box = next(m for m in metas if m.name == "box")
    rng = np.random.RandomState(5)
    R0 = np.linalg.qr(rng.randn(3, 3))[0]
    if np.linalg.det(R0) < 0:
        R0[:, 0] *= -1
    t0 = np.array([0.02, -0.01, 0.6])
    pose_gt = np.concatenate([R0, t0[:, None]], 1).astype(np.float32)
    # the box's symmetry: 90-degree rotation about its long (z) axis
    Rz = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32)
    pose_pred = np.concatenate([R0 @ Rz, t0[:, None]], 1).astype(np.float32)
    pts = jnp.asarray(box.model_pts)
    add = float(M.add_error(jnp.asarray(pose_pred), jnp.asarray(pose_gt),
                            pts))
    adds = float(M.add_error_sym(jnp.asarray(pose_pred),
                                 jnp.asarray(pose_gt), pts))
    thresh = 0.1 * box.diameter
    assert add > thresh, (add, thresh)       # plain ADD rejects
    assert adds < thresh * 0.5, (adds, thresh)   # ADD-S accepts

    # and the Evaluator dispatches on the flag
    from pvnet_tpu.eval.evaluator import Evaluator
    ev_sym = Evaluator(box)
    kps2d = project_np(box.points_3d, pose_pred, K)
    ev_sym.evaluate_batch(kps2d[None], pose_gt[None],
                          np.broadcast_to(K.astype(np.float32), (1, 3, 3)))
    assert ev_sym.add_recorder == [True]
    import dataclasses
    ev_plain = Evaluator(dataclasses.replace(box, symmetric=False))
    ev_plain.evaluate_batch(kps2d[None], pose_gt[None],
                            np.broadcast_to(K.astype(np.float32),
                                            (1, 3, 3)))
    assert ev_plain.add_recorder == [False]
