"""Spatial partitioning: shard the FCN over image rows for latency.

The reference's only parallelism is DataParallel (replicate the net,
split the batch — ref tools/train_linemod.py:183-184), which cannot make
a SINGLE image faster. On a TPU slice the natural latency axis is
spatial: shard the image's H dimension over an ``sp`` mesh axis and jit
the forward under those shardings — XLA's SPMD partitioner splits every
conv spatially and inserts the halo exchanges (ppermute of boundary rows
over ICI) itself; nothing in the model changes. BN at inference uses
running stats, so there is no cross-shard normalization traffic, and the
align-corners upsample matmuls over the sharded axis become contractions
XLA resolves with a psum.

Voting/PnP work on ~10^3 selected pixels — trivial FLOPs — so the head
fields are gathered at that boundary (one all-gather of the seg/ver
fields) and the vote + solve run replicated on every chip rather than
paying a second partitioning round trip.

Composes with data parallelism on a 2D ('data', 'sp') mesh: batches
split over 'data', each sub-batch's rows over 'sp'.

Usage:
    mesh = make_mesh((2, 4), ("data", "sp"))
    run = make_spatial_pose_pipeline(mesh, model.apply, pts3d, K)
    pose, kps = run(variables, images, key)   # images [b, h, w, 3]
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvnet_tpu import pipeline as pl


def make_spatial_pose_pipeline(mesh: Mesh, apply_fn, points_3d, K,
                               params: pl.VoteParams = pl.VoteParams(),
                               uncertainty: bool = False,
                               impl: Optional[str] = None,
                               sp_axis: str = "sp",
                               data_axis: Optional[str] = None):
    """Image→pose with the FCN sharded over image rows.

    Args:
      mesh: device mesh containing ``sp_axis`` (and optionally
        ``data_axis`` for a 2D data×spatial layout).
      sp_axis: mesh axis the image H dimension is split over.
      data_axis: mesh axis the batch dimension is split over (None =
        batch replicated; every chip sees every image, its row slab of
        each).

    Returns f(variables, image [b,h,w,3], key) -> (pose [b,3,4],
    kps [b,vn,2]), jitted with the spatial in-shardings. H must divide
    by the sp axis size times the output stride alignment (use
    8-multiples per shard for the resnet*_8s models).
    """
    points_3d = jnp.asarray(points_3d, jnp.float32)
    K = jnp.asarray(K, jnp.float32)
    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, P(data_axis, sp_axis))
    out_batch = NamedSharding(mesh, P(data_axis))
    gather_spec = P(data_axis)                     # rows gathered, batch kept

    def run(variables, image, key):
        mask, vertex = pl.predict_fields(apply_fn, variables, image)
        # Gather the row shards here: voting touches ~max_num pixels, so
        # partitioning it buys nothing and the constraint makes the
        # FCN→vote boundary one explicit all-gather instead of whatever
        # propagation would pick.
        mask = jax.lax.with_sharding_constraint(mask, NamedSharding(
            mesh, gather_spec))
        vertex = jax.lax.with_sharding_constraint(vertex, NamedSharding(
            mesh, gather_spec))
        if uncertainty:
            mean, cov = pl.keypoints_with_covariance(mask, vertex, key,
                                                     params, impl)
            pose = pl.poses_from_keypoints(points_3d, mean, K, covar=cov)
            return pose, mean
        kps = pl.keypoints_from_fields(mask, vertex, key, params, impl)
        pose = pl.poses_from_keypoints(points_3d, kps, K)
        return pose, kps

    return jax.jit(run, in_shardings=(repl, img_sharding, repl),
                   out_shardings=(out_batch, out_batch))


def make_spatial_field_fn(mesh: Mesh, apply_fn, sp_axis: str = "sp",
                          data_axis: Optional[str] = None):
    """Row-sharded FCN forward only: f(variables, image) -> (mask, vertex)
    with outputs still row-sharded (P(data, sp)). For pipelines that keep
    post-processing off-device or custom."""
    repl = NamedSharding(mesh, P())
    img_sharding = NamedSharding(mesh, P(data_axis, sp_axis))

    def run(variables, image):
        return pl.predict_fields(apply_fn, variables, image)

    return jax.jit(run, in_shardings=(repl, img_sharding),
                   out_shardings=(img_sharding, img_sharding))
