"""Pin the ImageNet converter to torchvision's exact checkpoint layout.

No torchvision/model_zoo checkpoint can be downloaded in this environment
(zero egress), so utils/imagenet_manifest.py vendors the key/shape manifest
torchvision's resnet{18,34,50} state_dicts are guaranteed to have (it is
deterministic from the architecture). These tests assert the converter
(utils/torch_convert.load_imagenet_backbone, ref resnet.py:223-232)
consumes PRECISELY that manifest — every key, strict both ways, correct
shapes into the flax backbone — so a real checkpoint will load the moment
one is available, and any drift between torchvision's layout and our
mapping fails here first.
"""
import numpy as np
import pytest

from pvnet_tpu.utils import imagenet_manifest as man
from pvnet_tpu.utils.torch_convert import (convert_imagenet_backbone,
                                           load_imagenet_backbone)


def synth_state_dict(arch):
    rng = np.random.RandomState(0)
    return {k: (rng.randn(*s).astype(np.float32) if s
                else np.asarray(0, np.int64))
            for k, s in man.torchvision_manifest(arch).items()}


@pytest.mark.parametrize("arch", ["resnet18", "resnet34", "resnet50"])
def test_converter_consumes_exact_manifest(arch):
    """Every manifest tensor is consumed; nothing else is required."""
    sd = synth_state_dict(arch)
    params, stats = convert_imagenet_backbone(sd, arch)
    # conv + bn tensors (minus fc + counters) must all land in the tree
    n_expected = sum(1 for k in sd
                     if k not in ("fc.weight", "fc.bias")
                     and not k.endswith("num_batches_tracked"))
    assert len(params) + len(stats) == n_expected


@pytest.mark.parametrize("arch", ["resnet18", "resnet34", "resnet50"])
def test_converter_rejects_extra_and_missing(arch):
    sd = synth_state_dict(arch)
    sd_extra = dict(sd, **{"layer9.0.conv1.weight":
                           np.zeros((1, 1, 1, 1), np.float32)})
    with pytest.raises(KeyError):
        convert_imagenet_backbone(sd_extra, arch)
    sd_missing = dict(sd)
    del sd_missing["layer2.0.downsample.0.weight"]
    with pytest.raises(KeyError):
        convert_imagenet_backbone(sd_missing, arch)


@pytest.mark.parametrize("arch,network", [("resnet18", "resnet18_8s"),
                                          ("resnet34", "resnet34_8s"),
                                          ("resnet50", "resnet50_8s")])
def test_manifest_loads_into_model(arch, network):
    """The manifest's shapes must match the flax backbone exactly — the
    full strict load (both-ways coverage + shape checks) succeeds."""
    import jax
    import jax.numpy as jnp
    from pvnet_tpu.models.pvnet import build_model
    model = build_model(network, ver_dim=18, seg_dim=2)
    variables = model.init(jax.random.PRNGKey(0),
                           jnp.zeros((1, 32, 32, 3)), train=False)
    sd = synth_state_dict(arch)
    out = load_imagenet_backbone(variables, sd, arch=arch)
    # spot-check a mapped tensor: conv1 OIHW -> HWIO
    w = np.asarray(
        out["params"]["ResNetBackbone_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(
        w, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)), rtol=1e-6)


def test_manifest_tensor_counts():
    """Torchvision's documented tensor counts (incl. fc + counters):
    resnet18 = 122, resnet34 = 218, resnet50 = 320."""
    assert len(man.torchvision_manifest("resnet18")) == 122
    assert len(man.torchvision_manifest("resnet34")) == 218
    assert len(man.torchvision_manifest("resnet50")) == 320
