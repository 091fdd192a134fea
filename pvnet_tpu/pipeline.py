"""End-to-end inference: image -> FCN -> voting -> PnP in one XLA program.

The reference splits inference across devices and the host: FCN forward on
GPU, per-image python RANSAC loops on GPU (ref EvalWrapper,
tools/train_linemod.py:94-130), then keypoints copied to the host for
OpenCV/Ceres PnP (ref evaluation_utils.py:143-201). Here the whole
image->pose path is jittable and batched, so a single ``jit`` compiles
network + voting + pose solve, and the batch scales over a data mesh with
no host round trips.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pvnet_tpu.ops import pnp as pnp_mod
from pvnet_tpu.ops import voting


class VoteParams(NamedTuple):
    """Voting envelope.

    Defaults (512 hypotheses / 512-pixel budget) sit between the
    reference's demo (512 hyps, ref demo.py:55) and its eval paths
    (128/round with early stop — typically 128-256 effective — and a
    100-pixel budget on the uncertainty path, ref train_linemod.py:
    104-106). Two trained-model sweeps (tools/envelope_study.py,
    studies/envelope.md):

    - clean synthetic test set (200 imgs): 256/512/1024 identical within
      sampling noise (ADD 25.5/30.0/27.0) — the envelope saturates early
      when masks are intact.
    - occluded synthetic test set (410 imgs, fragmented masks): proj
      saturates at 512 (57.3/57.7/58.7/58.5/58.8 % for 128..2048) but
      ADD keeps climbing (42.4/47.6/49.8/50.6/51.7 %). 512→1024 buys
      +0.85 pt ADD for 4x the vote-count work (~16→~64 ms of a ~197 ms
      batch, i.e. ~-12% e2e throughput); 512 stays the default knee.
      Raise hyp_num/max_num for heavily occluded data where ADD matters
      more than throughput."""
    hyp_num: int = 512
    inlier_thresh: float = 0.99
    max_num: int = 512
    min_num: int = 5
    # Covariance budget for the uncertainty solver. The reference uses
    # >=4096 only because its CUDA buffers ran 256-hypothesis rounds (ref
    # ransac_voting_gpu.py:333); a trained-checkpoint sweep on the
    # occluded split (studies/envelope.md, 2026-08-20) measured identical
    # metrics at 1024/2048/4096 (proj 66.8/66.7/67.0, ADD 58.2/58.2/57.9)
    # while 1024 runs the uncertainty pipeline at 762 vs 701 poses/s.
    uncertainty_hyp_num: int = 1024


def normalize_packed_u8(image_u8: jnp.ndarray,
                        dtype=jnp.float32) -> jnp.ndarray:
    """[b, h, w, 3] uint8 -> [b, h/2, w/2, 12] ImageNet-normalized, for
    models built with stem='packed4'.

    The space-to-depth transpose runs in uint8 — 1/4 the relayout bytes
    of packing the normalized float image (the cost that refuted in-graph
    packing, CLAUDE.md) — and per-channel normalization exactly commutes
    with packing (mean/std tiled 4x; tests/test_packed_stem.py).

    Already-packed [b, h/2, w/2, 12] uint8 input (host-side pack — a
    cheap numpy op at decode time) skips the device transpose and only
    normalizes."""
    from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    from pvnet_tpu.models.resnet import space_to_depth2
    xp = (image_u8 if image_u8.shape[-1] == 12
          else space_to_depth2(image_u8))
    mean12 = jnp.tile(jnp.asarray(IMAGENET_MEAN, dtype), 4)
    std12 = jnp.tile(jnp.asarray(IMAGENET_STD, dtype), 4)
    return (xp.astype(dtype) / 255.0 - mean12) / std12


def predict_fields(apply_fn, variables, image: jnp.ndarray
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """FCN forward: [b, h, w, 3] -> (mask [b, h, w], vertex field).

    argmax segmentation like the reference wrappers
    (ref train_linemod.py:99-102). With an NHWC head the vertex field is
    [b, h, w, vn, 2]; with head_layout='NCHW' it stays channel-major
    [b, vn*2, h, w] (the voting layer accepts both — the channel-major
    form feeds the selection kernel without a layout change)."""
    seg_pred, ver_pred = apply_fn(variables, image, train=False)
    b, ih, iw, ic = image.shape
    h, w = (2 * ih, 2 * iw) if ic == 12 else (ih, iw)   # packed-stem input
    if seg_pred.shape[1:3] == (h, w):                       # NHWC head
        mask = jnp.argmax(seg_pred, axis=-1)
        vd = ver_pred.shape[-1]
        vertex = ver_pred.reshape(b, h, w, vd // 2, 2)
        return mask, vertex
    mask = jnp.argmax(seg_pred, axis=1)                     # NCHW head
    return mask, ver_pred


def keypoints_from_fields(mask: jnp.ndarray, vertex: jnp.ndarray,
                          key: jax.Array,
                          params: VoteParams = VoteParams(),
                          impl: Optional[str] = None) -> jnp.ndarray:
    """Plain path: v3 voting (ref EvalWrapper :94-106). [b, vn, 2]."""
    return voting.ransac_voting_v3(
        mask, vertex, key, hyp_num=params.hyp_num,
        inlier_thresh=params.inlier_thresh, max_num=params.max_num,
        min_num=params.min_num, impl=impl)


def keypoints_with_covariance(mask: jnp.ndarray, vertex: jnp.ndarray,
                              key: jax.Array,
                              params: VoteParams = VoteParams(),
                              impl: Optional[str] = None
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uncertainty path: v3 voting then hypothesis covariance
    (ref UncertaintyEvalWrapper :119-130)."""
    k1, k2 = jax.random.split(key)
    mean = voting.ransac_voting_v3(
        mask, vertex, k1, hyp_num=params.hyp_num,
        inlier_thresh=params.inlier_thresh, max_num=params.max_num,
        min_num=params.min_num, impl=impl)
    return voting.estimate_voting_distribution_with_mean(
        mask, vertex, mean, k2, hyp_num=params.uncertainty_hyp_num,
        inlier_thresh=params.inlier_thresh, max_num=params.max_num,
        min_num=params.min_num, impl=impl)


def poses_from_keypoints(points_3d: jnp.ndarray, kps_2d: jnp.ndarray,
                         K: jnp.ndarray,
                         covar: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Batched pose solve. kps_2d [b, vn, 2]; K [3, 3] or [b, 3, 3];
    covar [b, vn, 2, 2] selects the uncertainty-weighted solver."""
    per_image_K = K.ndim == 3

    if covar is None:
        if per_image_K:
            return pnp_mod.pnp_batch_K(points_3d, kps_2d, K)
        return pnp_mod.pnp_batch(points_3d, kps_2d, K)

    from pvnet_tpu.ops.geometry import inv_sqrtm_2x2
    W = inv_sqrtm_2x2(covar)
    bad = (covar[..., 0, 0] < 1e-6) | jnp.any(jnp.isnan(covar),
                                              axis=(-2, -1))
    W = jnp.where(bad[..., None, None], 0.0, W)
    w3 = jnp.stack([W[..., 0, 0], W[..., 0, 1], W[..., 1, 1]], axis=-1)
    if per_image_K:
        return pnp_mod.uncertainty_pnp_batch_K(kps_2d, w3, points_3d, K)
    return pnp_mod.uncertainty_pnp_batch(kps_2d, w3, points_3d, K)


def fused_tail_foreground(apply_fn, variables, image: jnp.ndarray,
                          max_num: int, key: jax.Array,
                          dtype=jnp.bfloat16, tail_depth: int = 1,
                          tail_quant: bool = False):
    """Foreground sample via the packed inference tail (ops/packed_tail.py).

    Runs the FCN to the 2s stage (tail_depth=1), the 4s stage
    (tail_depth=2) or the 8s stage (tail_depth=3 — every decoder tensor
    below the 128-channel 8s stage), then computes the remaining decoder
    — upsample(s), conv4s/conv2s stages, raw conv, BN/LReLU, head —
    entirely on
    half-resolution packed lattices (every op a plain XLA matmul/conv on
    128-aligned channels) and samples the packed field directly — the
    full-resolution seg/ver tensors never materialize. The plain path's
    raw stage costs ~16 ms of a 37 ms forward at batch 16 purely from
    channel lane-padding (see ops/packed_tail.py and CLAUDE.md
    "Performance rules")."""
    from pvnet_tpu.ops import packed_tail
    from pvnet_tpu.ops import voting

    if tail_depth >= 3:
        fm8, x4s, x2s = apply_fn(variables, image, train=False,
                                 return_8s_features=True)
        packed, fgcnt = packed_tail.packed_tail_deep3_from_variables(
            variables, fm8, x4s, x2s, image, dtype=dtype, quant=tail_quant)
    elif tail_depth == 2:
        fm4, x2s = apply_fn(variables, image, train=False,
                            return_4s_features=True)
        packed, fgcnt = packed_tail.packed_tail_deep_from_variables(
            variables, fm4, x2s, image, dtype=dtype, quant=tail_quant)
    else:
        fm = apply_fn(variables, image, train=False,
                      return_2s_features=True)
        packed, fgcnt = packed_tail.packed_tail_from_variables(
            variables, fm, image, dtype=dtype, quant=tail_quant)
    return voting.sample_foreground_packed(packed, fgcnt, max_num, key)


def make_pose_pipeline(apply_fn, points_3d, K,
                       params: VoteParams = VoteParams(),
                       uncertainty: bool = False,
                       impl: Optional[str] = None,
                       fused_tail: bool = False,
                       tail_depth: int = 1,
                       tail_dtype=jnp.bfloat16,
                       tail_quant: bool = False,
                       raw_uint8: bool = False):
    """Build the fully fused image->pose function.

    Returns f(variables, image [b,h,w,3], key) -> (pose [b,3,4],
    kps [b,vn,2]); jit it once per image shape.

    fused_tail=True routes upsample + raw conv + head + foreground
    selection through the packed lattice tail (ops/packed_tail.py, see
    fused_tail_foreground); tail_depth=2 additionally packs the 2s
    decoder stage (conv2s + the 4s->2s upsample), tail_depth=3 the 4s
    stage as well. Requires a
    resnet*_8s-shaped PVNet and even image dims. The voting/PnP math
    downstream is identical (exact-math parity tested; bf16 rounding
    only).
    """
    points_3d = jnp.asarray(points_3d, jnp.float32)
    K = jnp.asarray(K, jnp.float32)

    def run_fused(variables, image, key):
        from pvnet_tpu.ops import voting
        if raw_uint8:
            image = normalize_packed_u8(image)
        k0, k1, k2 = jax.random.split(key, 3)
        fg = fused_tail_foreground(apply_fn, variables, image,
                                   params.max_num, k0, dtype=tail_dtype,
                                   tail_depth=tail_depth,
                                   tail_quant=tail_quant)
        kps = voting.ransac_voting_v3_from_fg(
            fg, k1, hyp_num=params.hyp_num,
            inlier_thresh=params.inlier_thresh, min_num=params.min_num,
            impl=impl)
        if uncertainty:
            _, cov = voting.estimate_voting_distribution_from_fg(
                fg, kps, k2, hyp_num=params.uncertainty_hyp_num,
                inlier_thresh=params.inlier_thresh, impl=impl)
            pose = poses_from_keypoints(points_3d, kps, K, covar=cov)
            return pose, kps
        pose = poses_from_keypoints(points_3d, kps, K)
        return pose, kps

    def run(variables, image, key):
        if raw_uint8:
            image = normalize_packed_u8(image)
        mask, vertex = predict_fields(apply_fn, variables, image)
        if uncertainty:
            mean, cov = keypoints_with_covariance(mask, vertex, key, params,
                                                  impl)
            pose = poses_from_keypoints(points_3d, mean, K, covar=cov)
            return pose, mean
        kps = keypoints_from_fields(mask, vertex, key, params, impl)
        pose = poses_from_keypoints(points_3d, kps, K)
        return pose, kps

    return run_fused if fused_tail else run


def make_multiclass_pose_pipeline(apply_fn, points_3d_per_class, K,
                                  params: VoteParams = VoteParams(),
                                  refine_iter_num=None,
                                  impl: Optional[str] = None):
    """Fully fused multi-object inference: one forward, per-class voting
    over the class-labeled argmax mask, one batched PnP per class.

    The reference's analog loops python-side over classes and images
    around ``ransac_voting_layer`` (ref ransac_voting_gpu.py:10-97); here
    the class loop is a static unroll inside one XLA program
    (ops/voting.ransac_voting_multiclass).

    Args:
      points_3d_per_class: [C, vn, 3] canonical keypoints per class
        (class c = label c+1 in the segmentation; label 0 = background).
    Returns:
      f(variables, image [b,h,w,3], key) -> (poses [b, C, 3, 4],
      kps [b, C, vn, 2]). The model must emit seg_dim = C+1 logits and a
      shared vn*2 vertex field (see
      data/vertex.compute_vertex_targets_multiclass).
    """
    pts = jnp.asarray(points_3d_per_class, jnp.float32)
    C, vn = pts.shape[0], pts.shape[1]
    K = jnp.asarray(K, jnp.float32)

    def run(variables, image, key):
        # predict_fields argmaxes the full label set (0..C) and keeps the
        # vertex field in whichever layout the head emits (NHWC or NCHW —
        # the voting layers accept both)
        labels, vertex = predict_fields(apply_fn, variables, image)
        kps = voting.ransac_voting_multiclass(
            labels, vertex, key, class_num=C + 1, hyp_num=params.hyp_num,
            inlier_thresh=(None if refine_iter_num is not None
                           else params.inlier_thresh),
            max_num=params.max_num, min_num=params.min_num,
            refine_iter_num=refine_iter_num, impl=impl)   # [b, C, vn, 2]
        poses = jnp.stack(
            [pnp_mod.pnp_batch(pts[c], kps[:, c], K) for c in range(C)],
            axis=1)
        return poses, kps

    return run


def make_sharded_pose_pipeline(mesh, apply_fn, points_3d, K,
                               params: VoteParams = VoteParams(),
                               uncertainty: bool = False,
                               impl: Optional[str] = None,
                               fused_tail: bool = False,
                               tail_depth: int = 1,
                               tail_dtype=jnp.bfloat16,
                               tail_quant: bool = False,
                               raw_uint8: bool = False):
    """Data-parallel fused inference over a device mesh.

    Variables replicated, images split on dim 0 over the 'data' axis —
    pose throughput scales linearly with chips since voting and PnP are
    per-image (no cross-image collectives). The reference's analog is
    DataParallel around its EvalWrapper (ref train_linemod.py:183-184).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    run = make_pose_pipeline(apply_fn, points_3d, K, params, uncertainty,
                             impl, fused_tail=fused_tail,
                             tail_depth=tail_depth, tail_dtype=tail_dtype,
                             tail_quant=tail_quant, raw_uint8=raw_uint8)
    return jax.jit(run, in_shardings=(repl, data, repl),
                   out_shardings=(data, data))
