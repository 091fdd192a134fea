"""Vendored torchvision ResNet state_dict manifests (key -> shape).

The reference initializes every training run from torchvision/model_zoo
ImageNet weights (ref lib/networks/resnet.py:223-232, auto-download of
e.g. ``resnet18-f37072fd.pth``). This environment has no network and no
torchvision, so :func:`pvnet_tpu.utils.torch_convert.load_imagenet_backbone`
has never consumed a real checkpoint. The key/tensor-shape layout of those
checkpoints is, however, fully deterministic from the architecture — this
module vendors it exactly, so tests can pin the converter to torchvision's
real layout: if torchvision's state_dict format and our converter ever
disagree, :mod:`tests.test_torchvision_manifest` fails.

Expected artifact checksums (torchvision embeds the first 8 hex chars of
the file's SHA256 in the filename; full digests from torchvision's
published hub manifests):

- ``resnet18-f37072fd.pth``  sha256 starts ``f37072fd``
- ``resnet34-b627a593.pth``  sha256 starts ``b627a593``
- ``resnet50-0676ba61.pth``  sha256 starts ``0676ba61``

If network access ever appears: download the file, verify the sha256
prefix, then ``load_imagenet_backbone(variables, path, arch)`` directly.
"""
from __future__ import annotations

from typing import Dict, Tuple

# (stage_sizes, bottleneck) per arch — mirrors torchvision resnet.py
ARCHS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
}

_PLANES = (64, 128, 256, 512)
_STRIDES = (1, 2, 2, 2)


def _bn_entries(prefix: str, c: int, out: Dict[str, Tuple[int, ...]]):
    """BatchNorm2d state_dict tensors, in torch's emission order."""
    out[f"{prefix}.weight"] = (c,)
    out[f"{prefix}.bias"] = (c,)
    out[f"{prefix}.running_mean"] = (c,)
    out[f"{prefix}.running_var"] = (c,)
    out[f"{prefix}.num_batches_tracked"] = ()


def state_dict_manifest(arch: str = "resnet18") -> Dict[str, Tuple[int, ...]]:
    """Exact ``{key: shape}`` of ``torchvision.models.<arch>().state_dict()``.

    Conv weights are OIHW (torch layout). Includes the classifier ``fc.*``
    and the BN ``num_batches_tracked`` counters torchvision serializes —
    the converter must consume/discard every one of these keys and nothing
    else.
    """
    stage_sizes, bottleneck = ARCHS[arch]
    expansion = 4 if bottleneck else 1
    m: Dict[str, Tuple[int, ...]] = {}

    m["conv1.weight"] = (64, 3, 7, 7)
    _bn_entries("bn1", 64, m)

    inplanes = 64
    for stage, (n, planes, stride) in enumerate(
            zip(stage_sizes, _PLANES, _STRIDES)):
        for i in range(n):
            p = f"layer{stage + 1}.{i}"
            if bottleneck:
                # Bottleneck: 1x1 reduce, 3x3, 1x1 expand
                m[f"{p}.conv1.weight"] = (planes, inplanes, 1, 1)
                _bn_entries(f"{p}.bn1", planes, m)
                m[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
                _bn_entries(f"{p}.bn2", planes, m)
                m[f"{p}.conv3.weight"] = (planes * 4, planes, 1, 1)
                _bn_entries(f"{p}.bn3", planes * 4, m)
            else:
                # BasicBlock: two 3x3
                m[f"{p}.conv1.weight"] = (planes, inplanes, 3, 3)
                _bn_entries(f"{p}.bn1", planes, m)
                m[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
                _bn_entries(f"{p}.bn2", planes, m)
            if i == 0 and (stride != 1 or inplanes != planes * expansion):
                m[f"{p}.downsample.0.weight"] = (
                    planes * expansion, inplanes, 1, 1)
                _bn_entries(f"{p}.downsample.1", planes * expansion, m)
            inplanes = planes * expansion

    m["fc.weight"] = (1000, 512 * expansion)
    m["fc.bias"] = (1000,)
    return m


def synthesize_state_dict(arch: str = "resnet18", seed: int = 0):
    """A numpy state_dict with exactly the manifest's keys/shapes — the
    stand-in for a real download in tests."""
    import numpy as np
    rng = np.random.RandomState(seed)
    sd = {}
    for k, shape in state_dict_manifest(arch).items():
        if k.endswith("num_batches_tracked"):
            sd[k] = np.asarray(1000, dtype=np.int64)
        elif k.endswith("running_var"):
            sd[k] = rng.rand(*shape).astype(np.float32) + 0.5
        else:
            sd[k] = rng.randn(*shape).astype(np.float32) * 0.05
    return sd
