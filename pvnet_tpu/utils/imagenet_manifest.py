"""Canonical torchvision ImageNet ResNet checkpoint manifests.

The reference initializes every training run from model_zoo ImageNet
weights (ref lib/networks/resnet.py:223-232, auto-download of e.g.
``resnet18-5c106cde.pth``). This environment has no network access, so the
conversion path (utils/torch_convert.load_imagenet_backbone) is pinned
against the checkpoint *layout* instead: torchvision's state-dict key set
and tensor shapes are fully determined by the architecture definition, and
this module regenerates them exactly. tests/test_imagenet_manifest.py
asserts the converter consumes precisely this manifest — if torchvision's
layout and ours ever disagree, that test fails before any real checkpoint
is ever loaded.

Expected artifacts (torchvision URLs; filename hash = first 8 hex chars of
the file's SHA256, torchvision's naming convention):
  resnet18-f37072fd.pth   (IMAGENET1K_V1; legacy name resnet18-5c106cde.pth)
  resnet34-b627a593.pth   (IMAGENET1K_V1)
  resnet50-0676ba61.pth   (IMAGENET1K_V1)
Verify a downloaded file with
``sha256sum <file> | cut -c1-8`` against the name before loading.
"""
from __future__ import annotations

from typing import Dict, Tuple

# arch -> (stage_sizes, bottleneck)
ARCHS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
}

CHECKPOINT_FILES = {
    "resnet18": "resnet18-f37072fd.pth",
    "resnet34": "resnet34-b627a593.pth",
    "resnet50": "resnet50-0676ba61.pth",
}


def _bn_entries(prefix: str, c: int) -> Dict[str, Tuple[int, ...]]:
    return {
        f"{prefix}.weight": (c,),
        f"{prefix}.bias": (c,),
        f"{prefix}.running_mean": (c,),
        f"{prefix}.running_var": (c,),
        f"{prefix}.num_batches_tracked": (),
    }


def torchvision_manifest(arch: str = "resnet18"
                         ) -> Dict[str, Tuple[int, ...]]:
    """{torch key: shape} for torchvision's ``resnet{18,34,50}``
    ImageNet state_dict — keys in torchvision's iteration order is not
    guaranteed here; compare as sets/dicts."""
    stage_sizes, bottleneck = ARCHS[arch]
    expansion = 4 if bottleneck else 1
    m: Dict[str, Tuple[int, ...]] = {"conv1.weight": (64, 3, 7, 7)}
    m.update(_bn_entries("bn1", 64))

    inplanes = 64
    for stage, (n, planes, stride) in enumerate(
            zip(stage_sizes, (64, 128, 256, 512), (1, 2, 2, 2))):
        for i in range(n):
            p = f"layer{stage + 1}.{i}"
            if bottleneck:
                m[f"{p}.conv1.weight"] = (planes, inplanes, 1, 1)
                m.update(_bn_entries(f"{p}.bn1", planes))
                m[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
                m.update(_bn_entries(f"{p}.bn2", planes))
                m[f"{p}.conv3.weight"] = (planes * 4, planes, 1, 1)
                m.update(_bn_entries(f"{p}.bn3", planes * 4))
            else:
                m[f"{p}.conv1.weight"] = (planes, inplanes, 3, 3)
                m.update(_bn_entries(f"{p}.bn1", planes))
                m[f"{p}.conv2.weight"] = (planes, planes, 3, 3)
                m.update(_bn_entries(f"{p}.bn2", planes))
            if i == 0 and (stride != 1 or inplanes != planes * expansion):
                m[f"{p}.downsample.0.weight"] = (
                    planes * expansion, inplanes, 1, 1)
                m.update(_bn_entries(f"{p}.downsample.1",
                                     planes * expansion))
            inplanes = planes * expansion

    m["fc.weight"] = (1000, 512 * expansion)
    m["fc.bias"] = (1000,)
    return m
