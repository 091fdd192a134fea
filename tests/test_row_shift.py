"""Tests for the Pallas circular row/column shift kernels
(pvnet_tpu/ops/row_shift.py) against a numpy roll reference, covering
odd (padded) shapes, negative/overflowing shift values, and integer
dtypes. On the CPU test mesh the kernels run in interpret mode."""
import numpy as np
import jax.numpy as jnp
import pytest

from pvnet_tpu.ops.row_shift import shift_lanes, shift_sublanes


def _ref_lanes(x, s):
    P, R, C = x.shape
    return np.stack([np.stack([np.roll(x[p, r], -(int(s[p, r]) % C))
                               for r in range(R)]) for p in range(P)])


def _ref_sublanes(x, s):
    P, H, C = x.shape
    return np.stack([np.stack([np.roll(x[p, :, c], -(int(s[p, c]) % H))
                               for c in range(C)], axis=1)
                     for p in range(P)])


# interpret=None exercises the default route (the XLA wrapped gather on
# the CPU test mesh, the Mosaic kernel on TPU); interpret=True forces the
# Pallas kernel logic through interpret mode on any backend.
_MODES = [None, True]


class TestShiftLanes:
    @pytest.mark.parametrize("interpret", _MODES)
    @pytest.mark.parametrize("shape", [(3, 37, 100), (2, 16, 640),
                                       (1, 5, 129)])
    def test_matches_roll(self, shape, interpret):
        rng = np.random.RandomState(0)
        P, R, C = shape
        x = rng.rand(P, R, C).astype(np.float32)
        s = rng.randint(-C, 3 * C, (P, R)).astype(np.int32)
        y = np.asarray(shift_lanes(jnp.asarray(x), jnp.asarray(s),
                                   interpret=interpret))
        np.testing.assert_array_equal(y, _ref_lanes(x, s))

    @pytest.mark.parametrize("interpret", _MODES)
    def test_uint8(self, interpret):
        rng = np.random.RandomState(1)
        x = rng.randint(0, 256, (2, 9, 256)).astype(np.uint8)
        s = rng.randint(0, 256, (2, 9)).astype(np.int32)
        y = np.asarray(shift_lanes(jnp.asarray(x), jnp.asarray(s),
                                   interpret=interpret))
        np.testing.assert_array_equal(y, _ref_lanes(x, s))

    def test_zero_shift_identity(self):
        rng = np.random.RandomState(2)
        x = rng.rand(2, 8, 128).astype(np.float32)
        y = np.asarray(shift_lanes(jnp.asarray(x),
                                   jnp.zeros((2, 8), jnp.int32)))
        np.testing.assert_array_equal(y, x)


class TestShiftSublanes:
    @pytest.mark.parametrize("interpret", _MODES)
    @pytest.mark.parametrize("shape", [(5, 53, 41), (2, 480, 130),
                                       (8, 7, 128)])
    def test_matches_roll(self, shape, interpret):
        rng = np.random.RandomState(3)
        P, H, C = shape
        x = rng.rand(P, H, C).astype(np.float32)
        s = rng.randint(-H, 2 * H, (P, C)).astype(np.int32)
        y = np.asarray(shift_sublanes(jnp.asarray(x), jnp.asarray(s),
                                      interpret=interpret))
        np.testing.assert_array_equal(y, _ref_sublanes(x, s))
