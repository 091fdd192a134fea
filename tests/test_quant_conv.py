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
    assert rel < 0.15, rel   # random init; trained-ckpt metrics are
    # checked on the real eval path (tools/envelope_study.py --quant)


def test_training_path_ignores_quant(small_pair):
    """train=True must run the float path (identical outputs + grads)."""
    mf, mq, v, x = small_pair
    out_f = mf.apply(v, x, train=True, mutable=["batch_stats"])
    out_q = mq.apply(v, x, train=True, mutable=["batch_stats"])
    np.testing.assert_array_equal(np.asarray(out_f[0][1]),
                                  np.asarray(out_q[0][1]))
