"""space-to-batch dilated stages must match kernel-dilated convs exactly.

The backbone's layer3/layer4 run at output stride 8 with dilation 2/4
(ref lib/networks/resnet.py:167-198). models/resnet.py's dilated_impl='s2b'
reruns those stages as dense convs over interleaved subgrids — same
parameters, same math (see space_to_batch docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.models.resnet import (batch_to_space, resnet18_backbone,
                                     space_to_batch)


def test_space_to_batch_roundtrip():
    x = jnp.asarray(np.random.RandomState(0).randn(2, 12, 8, 5))
    for d in (2, 4):
        assert jnp.array_equal(batch_to_space(space_to_batch(x, d), d, 2), x)


@pytest.mark.parametrize("train", [False, True])
def test_s2b_matches_direct(train):
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 64, 96, 3).astype(np.float32))
    bb_s2b = resnet18_backbone(dilated_impl="s2b")
    bb_dir = resnet18_backbone(dilated_impl="direct")
    variables = bb_dir.init(jax.random.PRNGKey(0), x, train=False)

    kw = dict(train=train)
    if train:
        kw["mutable"] = ["batch_stats"]
        outs_a, stats_a = bb_s2b.apply(variables, x, **kw)
        outs_b, stats_b = bb_dir.apply(variables, x, **kw)
        # training batch statistics are over the same pixel set
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-5,
                                                    atol=1e-6),
            stats_a, stats_b)
    else:
        outs_a = bb_s2b.apply(variables, x, **kw)
        outs_b = bb_dir.apply(variables, x, **kw)
    for a, b in zip(outs_a, outs_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_s2b_falls_back_on_indivisible_sizes():
    # h/8 = 9 is not divisible by dilation 2/4: the s2b gate must fall
    # back to kernel-dilated convs instead of crashing.
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(1, 72, 72, 3).astype(np.float32))
    bb = resnet18_backbone(dilated_impl="s2b")
    variables = bb.init(jax.random.PRNGKey(0), x, train=False)
    outs = bb.apply(variables, x, train=False)
    assert outs[2].shape == (1, 9, 9, 128)
