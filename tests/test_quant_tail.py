"""Int8 extensions beyond the backbone: the functional conv2d_int8
helper, the packed-tail quant path (ops/packed_tail.py quant=True), and
the decoder fc/8s quant convs (models/pvnet.py quant_decoder)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.ops import packed_tail as pt
from pvnet_tpu.ops.quant_conv import conv2d_int8


def _rel(a, b):
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return np.linalg.norm(a - b) / max(np.linalg.norm(b), 1e-12)


@pytest.fixture(scope="module")
def model_and_vars():
    model = build_model("resnet18_8s", ver_dim=6, seg_dim=2)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(2, 32, 64, 3).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    return model, variables, x


class TestConv2dInt8:
    def test_matches_float_conv(self):
        rng = np.random.RandomState(3)
        x = jnp.asarray(rng.randn(2, 9, 11, 16), jnp.float32)
        w = jnp.asarray(rng.randn(2, 2, 16, 8) * 0.1, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (1, 1), [(0, 0), (0, 0)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv2d_int8(x, w)
        assert _rel(got, ref) < 0.02

    def test_strided_padded(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 12, 14, 4), jnp.float32)
        w = jnp.asarray(rng.randn(4, 4, 4, 8) * 0.2, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, w, (2, 2), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = conv2d_int8(x, w, (2, 2), ((1, 1), (1, 1)))
        assert got.shape == ref.shape
        assert _rel(got, ref) < 0.03

    def test_static_scale_matches_dynamic_at_true_absmax(self):
        """With s_x = the true per-image absmax/127, static == dynamic
        bit-for-bit (same quantization grid)."""
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(2, 7, 7, 8), jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 8, 8) * 0.1, jnp.float32)
        s = jnp.max(jnp.abs(x), axis=(1, 2, 3), keepdims=True) / 127.0
        a = conv2d_int8(x, w, padding=((1, 1), (1, 1)))
        b = conv2d_int8(x, w, padding=((1, 1), (1, 1)), s_x=s)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_per_image_independence(self):
        """Each image's output is unchanged by its batch neighbours."""
        rng = np.random.RandomState(6)
        x = rng.randn(2, 8, 8, 8).astype(np.float32)
        x[1] *= 100.0   # outlier neighbour
        w = jnp.asarray(rng.randn(3, 3, 8, 4) * 0.1, jnp.float32)
        full = conv2d_int8(jnp.asarray(x), w, padding=((1, 1), (1, 1)))
        solo = conv2d_int8(jnp.asarray(x[:1]), w, padding=((1, 1), (1, 1)))
        np.testing.assert_array_equal(np.asarray(full)[:1], np.asarray(solo))


class TestQuantPackedTail:
    def test_stage_quant_close_to_float(self, model_and_vars):
        model, variables, x = model_and_vars
        fm4, x2s = model.apply(variables, x, train=False,
                               return_4s_features=True)
        p = variables["params"]
        bs = variables["batch_stats"]
        cp = pt.fold_packed_stage(
            p["Conv_3"]["kernel"], p["BatchNorm_3"]["scale"],
            p["BatchNorm_3"]["bias"], bs["BatchNorm_3"]["mean"],
            bs["BatchNorm_3"]["var"], fm4.shape[-1],
            x2s.shape[1], x2s.shape[2])
        y_f = pt.run_packed_stage(fm4, x2s, cp, dtype=jnp.float32)
        y_q = pt.run_packed_stage(fm4, x2s, cp, dtype=jnp.float32,
                                  quant=True)
        assert y_q.shape == y_f.shape
        assert _rel(y_q, y_f) < 0.05

    def test_deep3_quant_pipeline_close(self, model_and_vars):
        """Full depth-3 packed tail with quant: head fields stay close and
        the same foreground pixels dominate."""
        model, variables, x = model_and_vars
        fm8, x4s, x2s = model.apply(variables, x, train=False,
                                    return_8s_features=True)
        pk_f, cnt_f = pt.packed_tail_deep3_from_variables(
            variables, fm8, x4s, x2s, x, dtype=jnp.float32)
        pk_q, cnt_q = pt.packed_tail_deep3_from_variables(
            variables, fm8, x4s, x2s, x, dtype=jnp.float32, quant=True)
        assert pk_q.shape == pk_f.shape
        assert _rel(pk_q, pk_f) < 0.08
        # foreground counts (seg argmax) agree on nearly every cell
        agree = np.mean(np.asarray(cnt_f) == np.asarray(cnt_q))
        assert agree > 0.97, agree

    def test_pipeline_tail_quant_flag(self, model_and_vars):
        from pvnet_tpu.pipeline import VoteParams, make_pose_pipeline
        model, variables, x = model_and_vars
        pts = np.random.RandomState(7).randn(3, 3).astype(np.float32)
        K = np.array([[60.0, 0, 32], [0, 60.0, 16], [0, 0, 1]], np.float32)
        run = jax.jit(make_pose_pipeline(
            model.apply, pts, K, params=VoteParams(hyp_num=32, max_num=64),
            fused_tail=True, tail_depth=3, tail_dtype=jnp.float32,
            tail_quant=True))
        pose, kps = run(variables, x, jax.random.PRNGKey(0))
        assert pose.shape == (2, 3, 4)
        assert np.isfinite(np.asarray(pose)).all()


class TestQuantDecoder:
    def test_param_tree_identical(self, model_and_vars):
        model, variables, x = model_and_vars
        mq = build_model("resnet18_8s", ver_dim=6, seg_dim=2,
                         quant_decoder=True)
        vq = mq.init(jax.random.PRNGKey(0), x, train=False)
        sf = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)),
                                    variables)
        sq = jax.tree_util.tree_map(lambda a: (a.shape, str(a.dtype)), vq)
        assert sf == sq

    def test_outputs_close_and_train_path_float(self, model_and_vars):
        model, variables, x = model_and_vars
        mq = build_model("resnet18_8s", ver_dim=6, seg_dim=2,
                         quant_decoder=True)
        seg_f, ver_f = model.apply(variables, x, train=False)
        seg_q, ver_q = mq.apply(variables, x, train=False)
        assert _rel(ver_q, ver_f) < 0.06
        # train=True must bypass quant entirely (bit-identical fwd)
        out_f = model.apply(variables, x, train=True,
                            mutable=["batch_stats"])[0]
        out_q = mq.apply(variables, x, train=True,
                         mutable=["batch_stats"])[0]
        np.testing.assert_array_equal(np.asarray(out_f[1]),
                                      np.asarray(out_q[1]))

    def test_fused_tail_features_close(self, model_and_vars):
        """quant_decoder composes with the packed tail entry points (the
        fused path only runs Conv_0/Conv_1 in-model)."""
        model, variables, x = model_and_vars
        mq = build_model("resnet18_8s", ver_dim=6, seg_dim=2,
                         quant_decoder=True)
        f8 = model.apply(variables, x, train=False,
                         return_8s_features=True)[0]
        q8 = mq.apply(variables, x, train=False,
                      return_8s_features=True)[0]
        assert _rel(q8, f8) < 0.06
