"""Int8 PTQ conv path (ops/quant_conv.py, ResNetBackbone.quant_stages)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.ops.quant_conv import Conv as QConv


def test_quant_conv_matches_float_within_ptq_error():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    mod_f = QConv(features=64, kernel_size=(3, 3),
                  padding=[(1, 1)] * 2, use_bias=False)
    v = mod_f.init(jax.random.PRNGKey(0), x)
    y_f = mod_f.apply(v, x)
    mod_q = QConv(features=64, kernel_size=(3, 3),
                  padding=[(1, 1)] * 2, use_bias=False, quant=True)
    y_q = mod_q.apply(v, x)
    rel = (np.linalg.norm(np.asarray(y_q - y_f))
           / np.linalg.norm(np.asarray(y_f)))
    assert rel < 0.02, rel


def test_quant_conv_dilation_and_bias():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(1, 12, 12, 8), jnp.float32)
    kw = dict(features=8, kernel_size=(3, 3), padding=[(2, 2)] * 2,
              kernel_dilation=(2, 2), use_bias=True)
    v = QConv(**kw).init(jax.random.PRNGKey(1), x)
    y_f = QConv(**kw).apply(v, x)
    y_q = QConv(**kw, quant=True).apply(v, x)
    assert y_q.shape == y_f.shape
    rel = (np.linalg.norm(np.asarray(y_q - y_f))
           / np.linalg.norm(np.asarray(y_f)))
    assert rel < 0.03, rel


@pytest.fixture(scope="module")
def small_pair():
    mf = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
    mq = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                     quant_stages=(2, 3))
    x = jnp.asarray(np.random.RandomState(2).randn(1, 32, 32, 3),
                    jnp.float32)
    v = mf.init(jax.random.PRNGKey(2), x, train=False)
    return mf, mq, v, x


def test_param_tree_identical(small_pair):
    """Trained checkpoints must load into quantized models unchanged."""
    mf, mq, v, x = small_pair
    vq = mq.init(jax.random.PRNGKey(2), x, train=False)
    pf = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), v)
    pq = jax.tree_util.tree_map(lambda a: (a.shape, a.dtype), vq)
    assert jax.tree_util.tree_structure(pf) == \
        jax.tree_util.tree_structure(pq)
    assert jax.tree_util.tree_all(
        jax.tree_util.tree_map(lambda a, b: a == b, pf, pq))


def test_quantized_model_close_to_float(small_pair):
    mf, mq, v, x = small_pair
    seg_f, ver_f = mf.apply(v, x, train=False)
    seg_q, ver_q = mq.apply(v, x, train=False)
    assert seg_q.shape == seg_f.shape and ver_q.shape == ver_f.shape
    rel = (np.linalg.norm(np.asarray(ver_q - ver_f))
           / max(np.linalg.norm(np.asarray(ver_f)), 1e-9))
    assert rel < 0.15, rel   # random init; trained-ckpt parity is pinned
    # by test_quant_trained_checkpoint below, and real eval-metric deltas
    # come from `tools/envelope_study.py --quant` on the TPU


def test_quant_batch_independent():
    """Each image's quantized output must not depend on batchmates: the
    activation scale is per-image (ADVICE r2 — a per-tensor absmax made
    poses batch-composition-dependent)."""
    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    # an extreme outlier image that would coarsen a shared scale 50x
    x = x.at[1].mul(50.0)
    mod = QConv(features=16, kernel_size=(3, 3), padding=[(1, 1)] * 2,
                use_bias=False, quant=True)
    v = mod.init(jax.random.PRNGKey(3), x)
    y_pair = mod.apply(v, x)
    y_solo = mod.apply(v, x[:1])
    np.testing.assert_array_equal(np.asarray(y_pair[:1]),
                                  np.asarray(y_solo))


def test_quant_trained_checkpoint():
    """Quantized forward stays close to float on the committed trained
    weights (assets/duck_ckpt.msgpack), not just random init."""
    import os
    ckpt = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "assets", "duck_ckpt.msgpack")
    if not os.path.exists(ckpt):
        pytest.skip("no committed checkpoint")
    from flax import serialization
    mf = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
    mq = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                     quant_stages=(2, 3))
    x = jnp.asarray(np.random.RandomState(4).rand(1, 64, 64, 3) * 2 - 1,
                    jnp.float32)
    v = mf.init(jax.random.PRNGKey(4), x, train=False)
    with open(ckpt, "rb") as f:
        v = serialization.from_bytes(
            {"params": v["params"], "batch_stats": v["batch_stats"]},
            f.read())
    seg_f, ver_f = mf.apply(v, x, train=False)
    seg_q, ver_q = mq.apply(v, x, train=False)
    rel = (np.linalg.norm(np.asarray(ver_q - ver_f, np.float32))
           / max(np.linalg.norm(np.asarray(ver_f, np.float32)), 1e-9))
    assert rel < 0.1, rel
    # segmentation decisions must essentially agree
    agree = np.mean(np.argmax(np.asarray(seg_q, np.float32), -1)
                    == np.argmax(np.asarray(seg_f, np.float32), -1))
    assert agree > 0.99, agree


def test_quant_static_mode_calibrated():
    """Static calibrated scales: close to float, deterministic, and the
    calibrate helper accumulates a running absmax per conv."""
    from pvnet_tpu.ops.quant_conv import calibrate
    rng = np.random.RandomState(6)
    x1 = jnp.asarray(rng.randn(2, 16, 16, 32), jnp.float32)
    x2 = jnp.asarray(rng.randn(2, 16, 16, 32) * 2.0, jnp.float32)
    kw = dict(features=16, kernel_size=(3, 3), padding=[(1, 1)] * 2,
              use_bias=False)
    v = QConv(**kw).init(jax.random.PRNGKey(6), x1)
    y_f = QConv(**kw).apply(v, x1)

    calib = QConv(**kw, quant=True, mode="calibrate")
    quant = calibrate(calib, v, [x1, x2])
    amax = float(jax.tree_util.tree_leaves(quant)[0])
    assert abs(amax - float(jnp.max(jnp.abs(x2)))) < 1e-5

    static = QConv(**kw, quant=True, mode="static")
    y_s = static.apply({**v, "quant": quant}, x1)
    rel = (np.linalg.norm(np.asarray(y_s - y_f))
           / np.linalg.norm(np.asarray(y_f)))
    assert rel < 0.04, rel
    # deterministic given the calibration
    y_s2 = static.apply({**v, "quant": quant}, x1)
    np.testing.assert_array_equal(np.asarray(y_s), np.asarray(y_s2))


def test_quant_static_model_end_to_end(small_pair):
    """quant_mode='static' through the full PVNet: calibrate on one batch,
    run, compare against float (the bench --quant_mode static path)."""
    from pvnet_tpu.ops.quant_conv import calibrate
    mf, _, v, x = small_pair
    mc = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                     quant_stages=(2, 3), quant_mode="calibrate")
    ms = build_model("resnet18_8s", ver_dim=18, seg_dim=2,
                     quant_stages=(2, 3), quant_mode="static")
    quant = calibrate(mc, v, [x], train=False)
    seg_f, ver_f = mf.apply(v, x, train=False)
    seg_s, ver_s = ms.apply({**v, "quant": quant}, x, train=False)
    rel = (np.linalg.norm(np.asarray(ver_s - ver_f))
           / max(np.linalg.norm(np.asarray(ver_f)), 1e-9))
    assert rel < 0.2, rel


def test_quant_composes_with_packed_tail(small_pair):
    """The production bench combination: int8 backbone stages + packed
    decoder tail (the tail consumes the 8s features the quantized
    backbone produces; bench.py --quant runs exactly this)."""
    from pvnet_tpu import pipeline as pl_mod
    from pvnet_tpu.ops import voting
    mf, mq, v, x = small_pair
    key = jax.random.PRNGKey(9)
    fg_q = jax.jit(lambda v, x: pl_mod.fused_tail_foreground(
        mq.apply, v, x, max_num=64, key=key, dtype=jnp.float32,
        tail_depth=3))(v, x)
    fg_f = jax.jit(lambda v, x: pl_mod.fused_tail_foreground(
        mf.apply, v, x, max_num=64, key=key, dtype=jnp.float32,
        tail_depth=3))(v, x)
    kps_q = voting.ransac_voting_v3_from_fg(fg_q, key, hyp_num=32)
    kps_f = voting.ransac_voting_v3_from_fg(fg_f, key, hyp_num=32)
    assert np.asarray(kps_q).shape == np.asarray(kps_f).shape
    assert np.isfinite(np.asarray(kps_q)).all()


def test_training_path_ignores_quant(small_pair):
    """train=True must run the float path (identical outputs + grads)."""
    mf, mq, v, x = small_pair
    out_f = mf.apply(v, x, train=True, mutable=["batch_stats"])
    out_q = mq.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_f[0][1]),
                                  np.asarray(out_q[0][1]))
