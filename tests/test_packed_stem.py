"""Packed stem (resnet.py stem='packed4'): the 4x4 conv on the
space-to-depth2-packed image computes the same function as the 7x7/2
stem, and pre-packed inputs are accepted directly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.models.resnet import (depth_to_space2, fold_conv7_to_packed4,
                                     space_to_depth2)


def _fold_variables(v7, vp):
    """Copy v7's params into the packed model's tree, folding conv1."""
    import flax
    flat7 = flax.traverse_util.flatten_dict(v7)
    flatp = flax.traverse_util.flatten_dict(vp)
    out = {}
    for k, tgt in flatp.items():
        src = flat7[k]
        if src.shape != tgt.shape:
            assert src.shape[:2] == (7, 7), (k, src.shape, tgt.shape)
            src = jnp.asarray(fold_conv7_to_packed4(src))
        out[k] = src
    return flax.traverse_util.unflatten_dict(out)


@pytest.fixture(scope="module")
def models():
    m7 = build_model("resnet18_8s", ver_dim=18)
    mp = build_model("resnet18_8s", ver_dim=18, stem="packed4")
    img = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v7 = m7.init(jax.random.PRNGKey(0), img, train=False)
    vp_init = mp.init(jax.random.PRNGKey(0), img, train=False)
    vp = _fold_variables(v7, vp_init)
    return m7, mp, v7, vp


def test_s2d_roundtrip():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 8, 10, 3).astype(np.float32))
    np.testing.assert_array_equal(np.asarray(depth_to_space2(
        space_to_depth2(x))), np.asarray(x))


def test_packed_stem_matches_conv7(models):
    m7, mp, v7, vp = models
    rng = np.random.RandomState(1)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    seg7, ver7 = jax.jit(lambda v, x: m7.apply(v, x, train=False))(v7, img)
    segp, verp = jax.jit(lambda v, x: mp.apply(v, x, train=False))(vp, img)
    np.testing.assert_allclose(np.asarray(segp), np.asarray(seg7),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(verp), np.asarray(ver7),
                               rtol=1e-4, atol=1e-4)


def test_prepacked_input_identical(models):
    _, mp, _, vp = models
    rng = np.random.RandomState(2)
    img = jnp.asarray(rng.randn(2, 64, 64, 3).astype(np.float32))
    ref = jax.jit(lambda v, x: mp.apply(v, x, train=False))(vp, img)
    packed = jax.jit(lambda v, x: mp.apply(v, x, train=False))(
        vp, space_to_depth2(img))
    for a, b in zip(ref, packed):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_normalize_commutes_with_packing():
    # norm12(pack(x_u8)) == pack(norm(x_u8)) with tiled mean/std
    from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    rng = np.random.RandomState(3)
    x = rng.randint(0, 255, (1, 16, 16, 3)).astype(np.uint8)
    ref = space_to_depth2(jnp.asarray(
        (x / 255.0 - IMAGENET_MEAN) / IMAGENET_STD, jnp.float32))
    mean12 = jnp.tile(jnp.asarray(IMAGENET_MEAN, jnp.float32), 4)
    std12 = jnp.tile(jnp.asarray(IMAGENET_STD, jnp.float32), 4)
    got = (space_to_depth2(jnp.asarray(x)).astype(jnp.float32) / 255.0
           - mean12) / std12
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5,
                               atol=1e-5)


def test_normalize_accepts_prepacked():
    # A host-prepacked [b, h/2, w/2, 12] uint8 input normalizes to the
    # same array as the raw [b, h, w, 3] path (pipeline.normalize_packed_u8
    # skips the device s2d when channels == 12).
    from pvnet_tpu import pipeline as pl
    rng = np.random.RandomState(4)
    x = rng.randint(0, 255, (2, 16, 16, 3)).astype(np.uint8)
    raw = pl.normalize_packed_u8(jnp.asarray(x))
    pre = pl.normalize_packed_u8(space_to_depth2(jnp.asarray(x)))
    np.testing.assert_array_equal(np.asarray(raw), np.asarray(pre))


def test_packed_stem_trains():
    # gradients flow through the packed stem (fresh init, no folding)
    mp = build_model("resnet18_8s", ver_dim=18, stem="packed4")
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    v = mp.init(jax.random.PRNGKey(0), img, train=True)

    def loss(params):
        (seg, ver), _ = mp.apply(
            {"params": params, "batch_stats": v["batch_stats"]}, img,
            train=True, mutable=["batch_stats"])
        return (seg ** 2).mean() + (ver ** 2).mean()

    g = jax.grad(loss)(v["params"])
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def _norm_f32(img_u8):
    from pvnet_tpu.config import IMAGENET_MEAN, IMAGENET_STD
    return jnp.asarray(
        (img_u8 / 255.0 - IMAGENET_MEAN) / IMAGENET_STD, jnp.float32)


def test_predict_fields_packed_u8(models):
    from pvnet_tpu import pipeline as pl
    m7, mp, v7, vp = models
    rng = np.random.RandomState(4)
    img_u8 = rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    mask7, ver7 = jax.jit(
        lambda v, x: pl.predict_fields(m7.apply, v, x))(v7, _norm_f32(img_u8))
    maskp, verp = jax.jit(
        lambda v, x: pl.predict_fields(mp.apply, v, x))(
            vp, pl.normalize_packed_u8(jnp.asarray(img_u8)))
    assert maskp.shape == mask7.shape and verp.shape == ver7.shape
    # argmax can flip on near-ties; fields themselves must be close
    mismatch = (np.asarray(maskp) != np.asarray(mask7)).mean()
    assert mismatch < 0.01, mismatch
    np.testing.assert_allclose(np.asarray(verp), np.asarray(ver7),
                               rtol=1e-3, atol=1e-3)


def test_fused_tail_accepts_packed_image(models):
    from pvnet_tpu import pipeline as pl
    from pvnet_tpu.ops import packed_tail as PT
    m7, mp, v7, vp = models
    rng = np.random.RandomState(5)
    img_u8 = rng.randint(0, 255, (1, 64, 64, 3)).astype(np.uint8)
    imgf = _norm_f32(img_u8)
    imgp = pl.normalize_packed_u8(jnp.asarray(img_u8))

    def fields7(v, im):
        fm8, x4s, x2s = m7.apply(v, im, train=False,
                                 return_8s_features=True)
        return PT.packed_tail_deep3_from_variables(
            v, fm8, x4s, x2s, im, dtype=jnp.float32)

    def fieldsp(v, im):
        fm8, x4s, x2s = mp.apply(v, im, train=False,
                                 return_8s_features=True)
        return PT.packed_tail_deep3_from_variables(
            v, fm8, x4s, x2s, im, dtype=jnp.float32)

    p7, c7 = jax.jit(fields7)(v7, imgf)
    pp, cp = jax.jit(fieldsp)(vp, imgp)
    np.testing.assert_allclose(np.asarray(pp), np.asarray(p7),
                               rtol=1e-3, atol=1e-3)
    assert abs(np.asarray(cp) - np.asarray(c7)).mean() < 0.05


def test_raw_uint8_pipeline_end_to_end(models):
    from pvnet_tpu import pipeline as pl
    from pvnet_tpu.config import LINEMOD_K
    _, mp, _, vp = models
    rng = np.random.RandomState(6)
    img_u8 = jnp.asarray(
        rng.randint(0, 255, (2, 64, 64, 3)).astype(np.uint8))
    pts3d = jnp.asarray(
        rng.uniform(-0.05, 0.05, (9, 3)).astype(np.float32))
    params = pl.VoteParams(hyp_num=64, max_num=64)
    run = jax.jit(pl.make_pose_pipeline(
        mp.apply, pts3d, LINEMOD_K, params=params, raw_uint8=True,
        fused_tail=True, tail_depth=3, tail_dtype=jnp.float32))
    pose, kps = run(vp, img_u8, jax.random.PRNGKey(0))
    assert pose.shape == (2, 3, 4) and kps.shape == (2, 9, 2)
    assert np.isfinite(np.asarray(pose)).all()
