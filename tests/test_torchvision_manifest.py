"""Pin the ImageNet-checkpoint converter to torchvision's exact layout.

The reference auto-downloads torchvision/model_zoo ResNet weights for every
training run (ref lib/networks/resnet.py:223-232). No network here, so the
layout is vendored (`pvnet_tpu/utils/torchvision_manifest.py`) and cross-
checked three ways: against an independent test-local derivation, against
the converter's consumed-key set, and — when torchvision is importable —
against the real `torchvision.models.<arch>().state_dict()`.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.utils import torch_convert as tc
from pvnet_tpu.utils import torchvision_manifest as tvm

from test_torch_convert import synth_torchvision_state_dict

ARCHS = ("resnet18", "resnet34", "resnet50")


@pytest.mark.parametrize("arch", ARCHS)
def test_manifest_matches_independent_derivation(rng, arch):
    """Two independently written constructions of torchvision's layout
    (the vendored manifest vs test_torch_convert's synthesizer) must agree
    key-for-key and shape-for-shape."""
    manifest = tvm.state_dict_manifest(arch)
    sd = synth_torchvision_state_dict(rng, arch)
    assert set(manifest) == set(sd)
    for k, shape in manifest.items():
        assert tuple(np.shape(sd[k])) == tuple(shape), k


@pytest.mark.parametrize("arch", ARCHS)
def test_converter_consumes_exactly_the_manifest(arch):
    """convert_imagenet_backbone is strict both ways on precisely the
    vendored key set: the full manifest converts cleanly; any extra key
    raises; any missing conv/bn key raises."""
    sd = tvm.synthesize_state_dict(arch)
    params, stats = tc.convert_imagenet_backbone(sd, arch)
    # every non-discarded tensor landed somewhere
    n_discarded = 2 + sum(k.endswith("num_batches_tracked") for k in sd)
    assert len(params) + len(stats) == len(sd) - n_discarded

    extra = dict(sd)
    extra["layer1.0.conv7.weight"] = np.zeros((1, 1, 1, 1), np.float32)
    with pytest.raises(KeyError, match="unconsumed"):
        tc.convert_imagenet_backbone(extra, arch)

    missing = dict(sd)
    del missing["layer2.0.downsample.0.weight"]
    with pytest.raises(KeyError):
        tc.convert_imagenet_backbone(missing, arch)


@pytest.mark.parametrize("arch,network", [("resnet18", "resnet18_8s"),
                                          ("resnet34", "resnet34_8s"),
                                          ("resnet50", "resnet50_8s")])
def test_manifest_covers_model_backbone(arch, network):
    """A manifest-shaped checkpoint fully initializes the corresponding
    PVNet backbone through the strict loader (coverage check inside)."""
    sd = tvm.synthesize_state_dict(arch, seed=7)
    model = build_model(network, ver_dim=18, seg_dim=2)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    new_vars = tc.load_imagenet_backbone(variables, sd, arch=arch)
    stem = np.asarray(
        new_vars["params"]["ResNetBackbone_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        stem, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))


@pytest.mark.parametrize("arch", ARCHS)
def test_manifest_matches_real_torchvision(arch):
    """The decisive pin — runs only where torchvision exists."""
    torchvision = pytest.importorskip("torchvision")
    model = getattr(torchvision.models, arch)()
    real = {k: tuple(v.shape) for k, v in model.state_dict().items()}
    assert real == {k: tuple(s)
                    for k, s in tvm.state_dict_manifest(arch).items()}
