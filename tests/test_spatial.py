"""Spatial partitioning (parallel/spatial.py): row-sharded FCN matches the
unsharded forward, and the sharded pipeline reproduces unsharded poses."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import LINEMOD_K
from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.parallel.mesh import make_mesh
from pvnet_tpu.parallel.spatial import (make_spatial_field_fn,
                                        make_spatial_pose_pipeline)
from pvnet_tpu import pipeline as pl


@pytest.fixture(scope="module")
def setup():
    model = build_model("resnet18_8s", ver_dim=18)
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), img, train=False)
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    pts3d = jnp.asarray(rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32))
    return model, variables, images, pts3d


def test_field_parity_sp8(setup):
    model, variables, images, _ = setup
    mesh = make_mesh((8,), ("sp",))
    sharded = make_spatial_field_fn(mesh, model.apply)
    mask_s, ver_s = sharded(variables, images)
    mask_r, ver_r = jax.jit(
        lambda v, im: pl.predict_fields(model.apply, v, im))(variables,
                                                             images)
    np.testing.assert_array_equal(np.asarray(mask_s), np.asarray(mask_r))
    np.testing.assert_allclose(np.asarray(ver_s), np.asarray(ver_r),
                               rtol=1e-4, atol=1e-4)


def test_pipeline_parity_sp_only(setup):
    model, variables, images, pts3d = setup
    mesh = make_mesh((8,), ("sp",))
    params = pl.VoteParams(hyp_num=64, max_num=64)
    run_sp = make_spatial_pose_pipeline(mesh, model.apply, pts3d, LINEMOD_K,
                                        params=params)
    run_ref = jax.jit(pl.make_pose_pipeline(model.apply, pts3d, LINEMOD_K,
                                            params=params))
    key = jax.random.PRNGKey(7)
    pose_s, kps_s = run_sp(variables, images, key)
    pose_r, kps_r = run_ref(variables, images, key)
    np.testing.assert_allclose(np.asarray(kps_s), np.asarray(kps_r),
                               atol=1e-2)
    np.testing.assert_allclose(np.asarray(pose_s), np.asarray(pose_r),
                               atol=1e-2)


def test_pipeline_data_times_sp(setup):
    model, variables, images, pts3d = setup
    mesh = make_mesh((2, 4), ("data", "sp"))
    params = pl.VoteParams(hyp_num=64, max_num=64)
    run = make_spatial_pose_pipeline(mesh, model.apply, pts3d, LINEMOD_K,
                                     params=params, data_axis="data")
    pose, kps = run(variables, images, jax.random.PRNGKey(3))
    assert pose.shape == (2, 3, 4) and kps.shape == (2, 9, 2)
    assert np.isfinite(np.asarray(pose)).all()


def test_uncertainty_path_runs(setup):
    model, variables, images, pts3d = setup
    mesh = make_mesh((8,), ("sp",))
    params = pl.VoteParams(hyp_num=64, max_num=64,
                           uncertainty_hyp_num=128)
    run = make_spatial_pose_pipeline(mesh, model.apply, pts3d, LINEMOD_K,
                                     params=params, uncertainty=True)
    pose, kps = run(variables, images, jax.random.PRNGKey(5))
    assert pose.shape == (2, 3, 4)
    assert np.isfinite(np.asarray(pose)).all()
