"""Stratified-selection kernel: numpy brute-force parity + XLA/Pallas
(interpret mode) agreement."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from pvnet_tpu.ops import select_kernel as SK


def brute_force(score, vertex, a, bb):
    b, h, w = score.shape
    c = vertex.shape[-1]
    tx_n = w // bb
    best = np.full((b, a, bb), -np.inf, np.float32)
    idx = np.zeros((b, a, bb), np.int32)
    dirs = np.zeros((b, a, bb, c), vertex.dtype)
    for bi in range(b):
        for y in range(h):
            for x in range(w):
                py, px = y % a, x % bb
                if score[bi, y, x] > best[bi, py, px]:
                    best[bi, py, px] = score[bi, y, x]
                    idx[bi, py, px] = (y // a) * tx_n + (x // bb)
                    dirs[bi, py, px] = vertex[bi, y, x]
    return best, idx, dirs


@pytest.fixture
def data():
    rng = np.random.RandomState(0)
    b, h, w, c = 2, 32, 48, 6
    score = rng.rand(b, h, w).astype(np.float32)
    score += (rng.rand(b, h, w) > 0.7) * 2.0       # sparse "foreground"
    vertex = rng.randn(b, h, w, c).astype(np.float32)
    return score, vertex


class TestStratifiedSelectKernel:
    @pytest.mark.parametrize("a,bb", [(8, 8), (4, 16)])
    def test_xla_matches_bruteforce(self, data, a, bb):
        score, vertex = data
        best, idx, dirs = jax.jit(SK.stratified_select_xla,
                                  static_argnums=(2, 3))(
            jnp.asarray(score), jnp.asarray(vertex), a, bb)
        wb, wi, wd = brute_force(score, vertex, a, bb)
        np.testing.assert_allclose(np.asarray(best), wb, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), wi)
        np.testing.assert_allclose(np.asarray(dirs), wd, rtol=1e-6,
                                   atol=1e-6)

    @pytest.mark.parametrize("a,bb", [(8, 8), (4, 16)])
    def test_pallas_interpret_matches_bruteforce(self, data, a, bb):
        score, vertex = data
        with pltpu.force_tpu_interpret_mode():
            best, idx, dirs = SK.stratified_select(
                jnp.asarray(score), jnp.asarray(vertex), a, bb)
        wb, wi, wd = brute_force(score, vertex, a, bb)
        np.testing.assert_allclose(np.asarray(best), wb, rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(idx), wi)
        np.testing.assert_allclose(np.asarray(dirs), wd, rtol=1e-6,
                                   atol=1e-6)

    def test_pallas_interpret_bf16_field(self, data):
        score, vertex = data
        v16 = jnp.asarray(vertex, jnp.bfloat16)
        with pltpu.force_tpu_interpret_mode():
            best, idx, dirs = SK.stratified_select(
                jnp.asarray(score), v16, 8, 8)
        assert dirs.dtype == jnp.bfloat16
        wb, wi, wd = brute_force(score, np.asarray(v16, np.float32), 8, 8)
        np.testing.assert_array_equal(np.asarray(idx), wi)
        np.testing.assert_allclose(np.asarray(dirs, np.float32), wd,
                                   rtol=1e-2, atol=1e-2)
