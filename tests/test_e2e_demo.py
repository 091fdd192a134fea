"""End-to-end acceptance test on the real reference demo data
(ref tools/demo.py flow): cat mask + GT pose -> GT vertex field -> voting ->
PnP -> pose, checked against the stored GT pose. This mirrors the
reference's demo acceptance test without needing a trained checkpoint."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu.eval.evaluator import Evaluator, ObjectMeta
from pvnet_tpu.ops import geometry as geo
from pvnet_tpu.ops.voting import (estimate_voting_distribution_with_mean,
                                  ransac_voting_v3)
from pvnet_tpu import pipeline as pl_mod

DEMO = "/root/reference/data/demo"

pytestmark = pytest.mark.skipif(not os.path.exists(DEMO),
                                reason="reference demo data not mounted")


@pytest.fixture(scope="module")
def demo_data():
    mask = np.array(Image.open(os.path.join(DEMO, "cat_mask.png"))
                    .convert("1")).astype(np.int32)
    pose = np.load(os.path.join(DEMO, "cat_pose.npy")).astype(np.float32)
    pts3d = np.loadtxt(os.path.join(DEMO, "cat_points_3d.txt")).astype(
        np.float32)
    bb8 = np.loadtxt(os.path.join(DEMO, "cat_bb8_3d.txt")).astype(
        np.float32)
    cam = pts3d @ pose[:, :3].T + pose[:, 3]
    uv = cam @ LINEMOD_K.T
    gt2d = (uv[:, :2] / uv[:, 2:]).astype(np.float32)
    return mask, pose, pts3d, bb8, gt2d


def vertex_field(mask, gt2d, noise=0.0, seed=0):
    ys, xs = np.nonzero(mask)
    pix = np.stack([xs, ys], -1).astype(np.float32)
    vec = gt2d[None] - pix[:, None]
    vec = vec / (np.linalg.norm(vec, axis=-1, keepdims=True) + 1e-9)
    if noise > 0:
        rng = np.random.RandomState(seed)
        ang = rng.randn(*vec.shape[:-1]) * noise
        ca, sa = np.cos(ang), np.sin(ang)
        vec = np.stack([ca * vec[..., 0] - sa * vec[..., 1],
                        sa * vec[..., 0] + ca * vec[..., 1]], -1)
    vertex = np.zeros(mask.shape + (gt2d.shape[0], 2), np.float32)
    vertex[ys, xs] = vec
    return vertex


class TestDemoE2E:
    def test_clean_field_recovers_pose(self, demo_data):
        mask, pose_gt, pts3d, bb8, gt2d = demo_data
        vertex = vertex_field(mask, gt2d)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        kps = ransac_voting_v3(m, v, jax.random.PRNGKey(0), hyp_num=512,
                               max_num=512, impl="xla")
        pose = pl_mod.poses_from_keypoints(
            jnp.asarray(pts3d), kps, jnp.asarray(LINEMOD_K))[0]
        ang = float(geo.rotation_angle_deg(pose[:, :3],
                                           jnp.asarray(pose_gt[:, :3])))
        trans = float(jnp.linalg.norm(pose[:, 3]
                                      - jnp.asarray(pose_gt[:, 3])))
        assert ang < 0.2, ang
        assert trans < 0.005, trans

    def test_noisy_field_evaluator_flow(self, demo_data):
        """Full eval flow with uncertainty PnP, scoring the ADD/proj/5cm5deg
        on the demo object."""
        mask, pose_gt, pts3d, bb8, gt2d = demo_data
        vertex = vertex_field(mask, gt2d, noise=0.05)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        key = jax.random.PRNGKey(0)
        mean = ransac_voting_v3(m, v, key, hyp_num=512, max_num=512,
                                impl="xla")
        _, cov = estimate_voting_distribution_with_mean(
            m, v, mean, key, hyp_num=1024, max_num=512, impl="xla")
        meta = ObjectMeta(points_3d=pts3d, model_pts=bb8,
                          diameter=float(np.linalg.norm(
                              bb8.max(0) - bb8.min(0))), symmetric=False,
                          name="cat")
        ev = Evaluator(meta)
        ev.evaluate_uncertainty(np.asarray(mean[0]), np.asarray(cov[0]),
                                pose_gt, LINEMOD_K)
        proj, add, cm = ev.average_precision(verbose=False)
        assert add == 1.0
        assert cm == 1.0

    def test_projected_bbox_drawable(self, demo_data, tmp_path):
        """Demo visualization path: project bb8 with the recovered pose and
        draw the overlay (ref demo.py:181-185)."""
        mask, pose_gt, pts3d, bb8, gt2d = demo_data
        vertex = vertex_field(mask, gt2d)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        kps = ransac_voting_v3(m, v, jax.random.PRNGKey(0), hyp_num=256,
                               max_num=256, impl="xla")
        pose = pl_mod.poses_from_keypoints(
            jnp.asarray(pts3d), kps, jnp.asarray(LINEMOD_K))[0]
        corners_pred = np.asarray(geo.project(
            jnp.asarray(bb8), pose, jnp.asarray(LINEMOD_K)))
        corners_gt = np.asarray(geo.project(
            jnp.asarray(bb8), jnp.asarray(pose_gt),
            jnp.asarray(LINEMOD_K)))
        assert np.abs(corners_pred - corners_gt).max() < 2.0
        from pvnet_tpu.utils.viz import visualize_bounding_box
        rgb = np.array(Image.open(os.path.join(DEMO, "cat.jpg")))
        out = visualize_bounding_box(rgb, corners_pred, corners_gt,
                                     save_path=str(tmp_path / "demo.png"))
        assert os.path.exists(out)
