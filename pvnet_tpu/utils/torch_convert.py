"""One-way torch -> flax weight conversion for reference checkpoints.

The reference ships torch checkpoints ({'net': state_dict, 'optim', 'epoch'},
ref lib/utils/net_utils.py:124-130; e.g. data/model/cat_demo/199.pth) and
loads ImageNet-pretrained ResNets via torch model_zoo (ref resnet.py:223-232).
This converter maps either of those state_dicts onto the flax PVNet /
backbone param tree:

- conv weights: OIHW -> HWIO transpose,
- batchnorm: weight/bias -> scale/bias, running_mean/var -> batch_stats,
- module-name mapping for the reference's Resnet18_8s/34/50 layout
  (ref model_repository.py:7-80).

Use :func:`load_torch_checkpoint` with a .pth path (requires torch, CPU) or
:func:`convert_state_dict` with an already-loaded ``{name: ndarray}``.
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _conv(out, params_path, torch_w):
    w = np.asarray(torch_w)
    out["params"][params_path] = np.transpose(w, (2, 3, 1, 0))


def _bn(out, path, sd, torch_prefix):
    out["params"][f"{path}/scale"] = np.asarray(sd[f"{torch_prefix}.weight"])
    out["params"][f"{path}/bias"] = np.asarray(sd[f"{torch_prefix}.bias"])
    out["batch_stats"][f"{path}/mean"] = np.asarray(
        sd[f"{torch_prefix}.running_mean"])
    out["batch_stats"][f"{path}/var"] = np.asarray(
        sd[f"{torch_prefix}.running_var"])


def _backbone_mapping(stage_sizes, bottleneck: bool):
    """[(flax_block_name, torch_layer_prefix, has_downsample), ...] in
    construction order."""
    blocks = []
    idx = 0
    expansion = 4 if bottleneck else 1
    inplanes = 64
    for stage, (n, planes, stride) in enumerate(
            zip(stage_sizes, (64, 128, 256, 512), (1, 2, 2, 2))):
        for i in range(n):
            has_down = (i == 0 and (stride != 1
                                    or inplanes != planes * expansion))
            name = ("Bottleneck_" if bottleneck else "BasicBlock_") \
                + str(idx)
            blocks.append((name, f"layer{stage + 1}.{i}", has_down))
            idx += 1
        inplanes = planes * expansion
    return blocks


def convert_state_dict(sd: Dict[str, np.ndarray],
                       stage_sizes=(2, 2, 2, 2), bottleneck: bool = False,
                       backbone_prefix: str = "resnet18_8s."
                       ) -> Tuple[dict, dict]:
    """Reference Resnet{18,34,50}_8s state_dict -> (params, batch_stats)
    flat dicts keyed by '/'-joined flax paths. Feed to
    :func:`unflatten` for the model tree."""
    out = {"params": {}, "batch_stats": {}}
    bp = backbone_prefix
    bb = "ResNetBackbone_0"

    # stem
    _conv(out, f"{bb}/Conv_0/kernel", sd[f"{bp}conv1.weight"])
    _bn(out, f"{bb}/BatchNorm_0", sd, f"{bp}bn1")

    n_conv_in_block = 3 if bottleneck else 2
    for name, torch_prefix, has_down in _backbone_mapping(stage_sizes,
                                                          bottleneck):
        for ci in range(n_conv_in_block):
            _conv(out, f"{bb}/{name}/Conv_{ci}/kernel",
                  sd[f"{bp}{torch_prefix}.conv{ci + 1}.weight"])
            _bn(out, f"{bb}/{name}/BatchNorm_{ci}", sd,
                f"{bp}{torch_prefix}.bn{ci + 1}")
        if has_down:
            _conv(out, f"{bb}/{name}/Conv_{n_conv_in_block}/kernel",
                  sd[f"{bp}{torch_prefix}.downsample.0.weight"])
            _bn(out, f"{bb}/{name}/BatchNorm_{n_conv_in_block}", sd,
                f"{bp}{torch_prefix}.downsample.1")

    # decoder heads (ref model_repository.py:22-58); fc lives under the
    # backbone module in torch but in the PVNet decoder here
    head_map = [
        ("Conv_0", f"{bp}fc.0", "BatchNorm_0", f"{bp}fc.1"),
        ("Conv_1", "conv8s.0", "BatchNorm_1", "conv8s.1"),
        ("Conv_2", "conv4s.0", "BatchNorm_2", "conv4s.1"),
        ("Conv_3", "conv2s.0", "BatchNorm_3", "conv2s.1"),
        ("Conv_4", "convraw.0", "BatchNorm_4", "convraw.1"),
    ]
    for conv_name, conv_t, bn_name, bn_t in head_map:
        _conv(out, f"{conv_name}/kernel", sd[f"{conv_t}.weight"])
        _bn(out, bn_name, sd, bn_t)
    _conv(out, "Conv_5/kernel", sd["convraw.3.weight"])
    out["params"]["Conv_5/bias"] = np.asarray(sd["convraw.3.bias"])
    return out["params"], out["batch_stats"]


def unflatten(flat: Dict[str, np.ndarray]) -> dict:
    tree: dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(v)
    return tree


def load_torch_checkpoint(pth_path: str, stage_sizes=(2, 2, 2, 2),
                          bottleneck: bool = False) -> Tuple[dict, dict]:
    """Load a reference .pth and convert. Returns (params, batch_stats)
    trees ready to drop into model.apply."""
    import torch
    payload = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = payload.get("net", payload)
    sd = {k: v.numpy() for k, v in sd.items()}
    params, stats = convert_state_dict(sd, stage_sizes, bottleneck)
    return unflatten(params), unflatten(stats)


def validate_against_model(model, params_tree: dict, stats_tree: dict,
                           input_shape=(1, 64, 64, 3)):
    """Shape-check a converted tree against a freshly initialized model;
    raises on mismatch. Returns the variables dict."""
    import jax
    import jax.numpy as jnp
    ref = model.init(jax.random.PRNGKey(0), jnp.zeros(input_shape),
                     train=False)

    def check(ref_tree, got_tree, where):
        ref_flat = jax.tree_util.tree_leaves_with_path(ref_tree)
        for path, leaf in ref_flat:
            node = got_tree
            for p in path:
                key = p.key if hasattr(p, "key") else str(p)
                if key not in node:
                    raise KeyError(f"missing {where}: {path}")
                node = node[key]
            if tuple(np.shape(node)) != tuple(leaf.shape):
                raise ValueError(
                    f"shape mismatch at {where} {path}: "
                    f"{np.shape(node)} vs {leaf.shape}")

    check(ref["params"], params_tree, "params")
    check(ref["batch_stats"], stats_tree, "batch_stats")
    return {"params": params_tree, "batch_stats": stats_tree}
