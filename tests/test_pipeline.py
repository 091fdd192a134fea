"""End-to-end pipeline test: a tiny model trained for a few steps is not
meaningful, so the E2E check wires GT-derived fields through the fused
pipeline pieces and checks pose recovery (the real demo data flow lives in
tests/test_e2e_demo.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu import pipeline as pl_mod
from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.ops import geometry as geo


class TestPredictFields:
    def test_shapes(self, rng):
        model = build_model("resnet18_8s", ver_dim=18)
        x = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        mask, vertex = pl_mod.predict_fields(model.apply, variables, x)
        assert mask.shape == (2, 64, 64)
        assert vertex.shape == (2, 64, 64, 9, 2)


class TestFusedPipeline:
    def test_full_jit_compiles_and_runs(self, rng):
        """jit of model+voting+PnP in one program."""
        model = build_model("resnet18_8s", ver_dim=18)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        run = jax.jit(pl_mod.make_pose_pipeline(
            model.apply, pts3d, LINEMOD_K,
            params=pl_mod.VoteParams(hyp_num=128, max_num=128),
            impl="xla"))
        pose, kps = run(variables, x, jax.random.PRNGKey(1))
        assert pose.shape == (1, 3, 4)
        assert kps.shape == (1, 9, 2)
        assert np.all(np.isfinite(np.asarray(pose)))

    def test_uncertainty_variant(self, rng):
        model = build_model("resnet18_8s", ver_dim=18)
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x, train=False)
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        run = jax.jit(pl_mod.make_pose_pipeline(
            model.apply, pts3d, LINEMOD_K,
            params=pl_mod.VoteParams(hyp_num=128, max_num=128,
                                     uncertainty_hyp_num=256),
            uncertainty=True, impl="xla"))
        pose, mean = run(variables, x, jax.random.PRNGKey(1))
        assert pose.shape == (1, 3, 4)
        assert np.all(np.isfinite(np.asarray(pose)))

    def test_per_image_K(self, rng):
        """Truncation LINEMOD path: per-image intrinsics
        (ref linemod_dataset.py:218-219, train_linemod.py:211-212)."""
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        # two images with different principal points
        Ks = np.stack([LINEMOD_K, LINEMOD_K + np.array(
            [[0, 0, 30], [0, 0, -20], [0, 0, 0]], np.float32)])
        pose_gt = np.concatenate(
            [np.eye(3, dtype=np.float32),
             np.array([[0.0], [0.0], [0.5]], np.float32)], 1)
        kps = np.stack([
            np.asarray(geo.project(jnp.asarray(pts3d),
                                   jnp.asarray(pose_gt),
                                   jnp.asarray(Ks[i])))
            for i in range(2)])
        poses = pl_mod.poses_from_keypoints(
            jnp.asarray(pts3d), jnp.asarray(kps), jnp.asarray(Ks))
        for i in range(2):
            ang = float(geo.rotation_angle_deg(
                poses[i, :, :3], jnp.asarray(pose_gt[:, :3])))
            assert ang < 0.5
            assert float(jnp.linalg.norm(
                poses[i, :, 3] - jnp.asarray(pose_gt[:, 3]))) < 5e-3


class TestShardedPipeline:
    def test_8_device_inference(self, rng):
        """Fused image->pose sharded over the virtual 8-device mesh."""
        from pvnet_tpu.parallel import make_mesh, replicate, shard_batch
        assert len(jax.devices()) == 8
        mesh = make_mesh()
        model = build_model("resnet18_8s", ver_dim=18)
        x = jnp.asarray(rng.randn(8, 64, 64, 3).astype(np.float32))
        variables = model.init(jax.random.PRNGKey(0), x[:1], train=False)
        pts3d = rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32)
        run = pl_mod.make_sharded_pose_pipeline(
            mesh, model.apply, pts3d, LINEMOD_K,
            params=pl_mod.VoteParams(hyp_num=128, max_num=128), impl="xla")
        variables = replicate(variables, mesh)
        xs = shard_batch(x, mesh)
        from jax.sharding import NamedSharding, PartitionSpec as P
        key = jax.device_put(jax.random.PRNGKey(1),
                             NamedSharding(mesh, P()))
        pose, kps = run(variables, xs, key)
        assert pose.shape == (8, 3, 4)
        assert np.all(np.isfinite(np.asarray(pose)))
