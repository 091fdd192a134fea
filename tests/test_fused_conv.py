"""Fused s2d-packed conv kernel: packing algebra + kernel parity vs the
XLA reference (interpret mode on CPU)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.ops import fused_conv as F


@pytest.fixture
def rng():
    return np.random.RandomState(0)


class TestPacking:
    def test_packed_matmul_equals_conv(self, rng):
        """The packed weight matrix reproduces the conv on an explicit
        16-tap im2col built in numpy."""
        cin, cout, H, W = 64, 8, 8, 12
        x = rng.randn(1, H, W, cin).astype(np.float32)
        w = rng.randn(3, 3, cin, cout).astype(np.float32) * 0.1
        want = np.asarray(F.conv3x3_bn_lrelu_ref(
            jnp.asarray(x), jnp.asarray(w), jnp.ones((cout,)),
            jnp.zeros((cout,)), alpha=1.0))     # alpha=1 -> no activation

        Wp = np.asarray(F.pack_conv3x3_weights(jnp.asarray(w)))
        xpad = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        HP, WP = H // 2, W // 2
        got = np.zeros((1, H, W, cout), np.float32)
        for i in range(HP):
            for j in range(WP):
                taps = []
                for p in range(4):
                    for q in range(4):
                        taps.append(xpad[0, 2 * i + p, 2 * j + q])
                v = np.concatenate(taps) @ Wp   # [4*cout]
                for a in range(2):
                    for c in range(2):
                        got[0, 2 * i + a, 2 * j + c] = \
                            v[(a * 2 + c) * cout:(a * 2 + c + 1) * cout]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_depth_from_s2d_roundtrip(self, rng):
        # pack: packed[b,i,j,(a*2+c)*cout+o] = y2[b,2i+a,2j+c,o]
        y2 = rng.randn(2, 6, 8, 5).astype(np.float32)
        packed = np.zeros((2, 3, 4, 20), np.float32)
        for a in range(2):
            for c in range(2):
                packed[..., (a * 2 + c) * 5:(a * 2 + c + 1) * 5] = \
                    y2[:, a::2, c::2]
        out = np.asarray(F.depth_from_s2d(jnp.asarray(packed), 5))
        np.testing.assert_allclose(out, y2)


class TestKernel:
    @pytest.mark.parametrize("cin,cout,H,W", [(64, 8, 16, 32),
                                              (128, 32, 8, 16)])
    def test_kernel_matches_ref_interpret(self, rng, cin, cout, H, W):
        x = jnp.asarray(rng.randn(2, H, W, cin) * 0.5, jnp.bfloat16)
        w = jnp.asarray(rng.randn(3, 3, cin, cout) * 0.05, jnp.float32)
        scale = jnp.asarray(rng.rand(cout) + 0.5, jnp.float32)
        bias = jnp.asarray(rng.randn(cout) * 0.1, jnp.float32)

        wp = F.pack_conv3x3_weights(w)
        run = functools.partial(F.conv3x3_s2d_packed, alpha=0.1, row_tile=4)
        from jax.experimental.pallas import tpu as pltpu
        with pltpu.force_tpu_interpret_mode():
            packed = run(x, wp, jnp.tile(scale, 4), jnp.tile(bias, 4))
        got = np.asarray(F.depth_from_s2d(packed, cout), np.float32)
        want = np.asarray(F.conv3x3_bn_lrelu_ref(
            x, w, scale, bias, alpha=0.1), np.float32)
        rel = np.abs(got - want) / (np.abs(want) + 0.05)
        assert rel.max() < 0.05, rel.max()

    def test_wrapper_fallback_on_cpu(self, rng):
        """Off-TPU the wrapper silently uses the XLA reference path."""
        x = jnp.asarray(rng.randn(1, 8, 8, 64) * 0.5, jnp.float32)
        w = jnp.asarray(rng.randn(3, 3, 64, 4) * 0.05, jnp.float32)
        scale = jnp.ones((4,), jnp.float32)
        bias = jnp.zeros((4,), jnp.float32)
        got = np.asarray(F.fused_conv3x3_bn_lrelu(x, w, scale, bias))
        want = np.asarray(F.conv3x3_bn_lrelu_ref(x, w, scale, bias))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
