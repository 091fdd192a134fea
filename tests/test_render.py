"""Render utilities tests: euler decomposition round trip, fibonacci
sphere coverage, python renderer artifacts, occlusion mask compositing."""
import os
import pickle

import numpy as np
import pytest

import jax.numpy as jnp

from pvnet_tpu.data import render as R
from pvnet_tpu.data.synthetic import generate_synthetic_linemod
from pvnet_tpu.ops import geometry as geo


class TestEuler:
    def test_szxz_roundtrip(self, rng):
        for _ in range(20):
            a1, a2, a3 = rng.uniform(-np.pi, np.pi), \
                rng.uniform(0.1, np.pi - 0.1), rng.uniform(-np.pi, np.pi)

            def rz(x):
                return np.array([[np.cos(x), -np.sin(x), 0],
                                 [np.sin(x), np.cos(x), 0], [0, 0, 1]])

            def rx(x):
                return np.array([[1, 0, 0], [0, np.cos(x), -np.sin(x)],
                                 [0, np.sin(x), np.cos(x)]])

            Rm = rz(a1) @ rx(a2) @ rz(a3)
            b1, b2, b3 = R.mat2euler_szxz(Rm)
            Rb = rz(b1) @ rx(b2) @ rz(b3)
            np.testing.assert_allclose(Rb, Rm, atol=1e-8)


class TestSphere:
    def test_sample_counts_and_ranges(self):
        azi, ele = R.sample_sphere(100, begin_elevation=0)
        assert len(azi) == len(ele) == 100
        assert (ele >= -1e-6).all() and (ele <= 90 + 1e-6).all()
        assert (azi >= 0).all() and (azi < 360).all()


class TestDataStatistics:
    def test_kde_sampling(self, rng):
        poses = []
        for _ in range(30):
            w = rng.randn(3) * 0.3
            Rm = np.asarray(geo.rodrigues(jnp.asarray(w, jnp.float32)))
            t = np.array([0, 0, rng.uniform(0.5, 0.9)], np.float32)
            poses.append(np.concatenate([Rm, t[:, None]], 1))
        stats = R.DataStatistics(poses)
        samples = stats.sample_poses(10, seed=0)
        assert samples.shape == (10, 6)
        # sampled z translations in the neighborhood of the data
        assert samples[:, 5].mean() == pytest.approx(0.7, abs=0.3)


class TestPythonRenderer:
    def test_render_set_artifacts(self, tmp_path):
        paths = generate_synthetic_linemod(str(tmp_path), "duck",
                                           num_images=2)
        renderer = R.PythonRenderer("duck", paths, K=R.LINEMOD_K)
        from pvnet_tpu.data.synthetic import sample_object_pose
        rng = np.random.RandomState(0)
        poses = [sample_object_pose(rng) for _ in range(2)]
        out = renderer.run(poses)
        for k in range(2):
            assert os.path.exists(os.path.join(out, f"{k}.jpg"))
            assert os.path.exists(os.path.join(out, f"{k}_depth.png"))
            with open(os.path.join(out, f"{k}_RT.pkl"), "rb") as f:
                rt = pickle.load(f)["RT"]
            np.testing.assert_allclose(rt, poses[k], atol=1e-6)


class TestOcclusionMasks:
    def test_nearer_object_wins(self, tmp_path):
        paths = generate_synthetic_linemod(str(tmp_path), "duck",
                                           num_images=1)
        # two "classes" sharing the same mesh: one 10 cm in front
        pose_far = np.concatenate(
            [np.eye(3), np.array([[0.0], [0.0], [0.7]])], 1).astype(
                np.float32)
        pose_near = pose_far.copy()
        pose_near[2, 3] = 0.6
        recs = {"duck": [{"RT": pose_near}], "duck2": [{"RT": pose_far}]}

        # alias duck2 -> duck mesh
        import shutil
        dst = os.path.join(paths.linemod_dir, "duck2")
        os.makedirs(dst, exist_ok=True)
        shutil.copy(os.path.join(paths.linemod_dir, "duck", "duck.ply"),
                    os.path.join(dst, "duck2.ply"))

        gen = R.generate_occlusion_masks(["duck", "duck2"], recs,
                                         paths=paths)
        idx, masks = next(iter(gen))
        assert masks["duck"].sum() > 0
        # the occluded (far) object must be mostly hidden
        assert masks["duck2"].sum() < 0.35 * masks["duck"].sum()


class TestSyntheticOcclusion:
    def test_occluder_shrinks_visible_mask(self):
        import numpy as np
        from pvnet_tpu.config import LINEMOD_K
        from pvnet_tpu.data.synthetic import (
            make_distractor_mesh, make_duck_mesh, render_synthetic_view,
            sample_distractors, sample_object_pose)
        rng = np.random.RandomState(3)
        mesh = make_duck_mesh()
        pose = sample_object_pose(rng)
        K = LINEMOD_K.copy()
        K[:2] *= 0.5                       # keep the object centered at 1/2 res
        _, mask_clean = render_synthetic_view(mesh, pose, K, 240, 320, rng)
        meshes = [make_distractor_mesh(rng)]
        dist = sample_distractors(pose, rng, meshes, occluder_prob=1.0)
        assert len(dist) == 1
        rgb, mask_occ = render_synthetic_view(mesh, pose, K, 240, 320, rng,
                                              distractors=dist)
        # forced occluder: strictly fewer visible target pixels, nonzero
        assert 0 < mask_occ.sum() < mask_clean.sum()
        # occluder pixels are rendered (not background noise): the image
        # differs from the mask where the distractor sits
        assert rgb.shape == (240, 320, 3)

    def test_generate_with_occluders_builds_db(self, tmp_path):
        paths = generate_synthetic_linemod(
            str(tmp_path), "duck", num_images=4, image_hw=(96, 128),
            occluder_prob=0.7, max_clutter=2)
        from pvnet_tpu.data.linemod import LineModImageDB
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        assert len(db.train_real_set) >= 1


class TestProfiling:
    def test_step_timer(self):
        from pvnet_tpu.utils.profiling import StepTimer
        t = StepTimer(sync=False)
        for _ in range(3):
            t.start()
            t.stop()
        s = t.summary()
        assert s["steps"] == 3 and s["mean_s"] >= 0
