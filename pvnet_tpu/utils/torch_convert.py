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


def _convert_backbone(out: dict, sd: Dict[str, np.ndarray], bp: str,
                      stage_sizes, bottleneck: bool) -> None:
    """Map the torch ResNet backbone tensors (prefix ``bp``) into ``out``.

    The torch key layout (conv1/bn1/layer{s}.{i}.conv{n}/bn{n}/downsample)
    is shared between the reference's Resnet{18,34,50}_8s backbones
    (prefixed, ref model_repository.py:7-80) and torchvision/model_zoo
    ImageNet checkpoints (unprefixed, ref resnet.py:223-232)."""
    bb = "ResNetBackbone_0"
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


def convert_state_dict(sd: Dict[str, np.ndarray],
                       stage_sizes=(2, 2, 2, 2), bottleneck: bool = False,
                       backbone_prefix: str = "resnet18_8s."
                       ) -> Tuple[dict, dict]:
    """Reference Resnet{18,34,50}_8s state_dict -> (params, batch_stats)
    flat dicts keyed by '/'-joined flax paths. Feed to
    :func:`unflatten` for the model tree."""
    out = {"params": {}, "batch_stats": {}}
    bp = backbone_prefix
    _convert_backbone(out, sd, bp, stage_sizes, bottleneck)

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


_ARCHS = {
    "resnet18": ((2, 2, 2, 2), False),
    "resnet34": ((3, 4, 6, 3), False),
    "resnet50": ((3, 4, 6, 3), True),
}


def convert_imagenet_backbone(sd: Dict[str, np.ndarray],
                              arch: str = "resnet18"
                              ) -> Tuple[dict, dict]:
    """torchvision/model_zoo ImageNet state_dict -> backbone-only
    (params, stats) flat dicts ('/'-joined flax paths).

    Strict: every tensor in ``sd`` must be consumed, except the classifier
    ``fc.weight``/``fc.bias`` the reference discards (it replaces fc with a
    conv head, ref resnet.py:223-280 + model_repository.py:21-26) and BN
    ``num_batches_tracked`` counters (meaningless under flax's
    fixed-momentum EMA). Raises KeyError on anything left over — a wrong
    arch or a non-torchvision checkpoint fails loudly instead of silently
    skipping weights.
    """
    stage_sizes, bottleneck = _ARCHS[arch]
    out = {"params": {}, "batch_stats": {}}
    _convert_backbone(out, sd, "", stage_sizes, bottleneck)

    consumed = set()
    for k in sd:
        if k in ("fc.weight", "fc.bias") or k.endswith(
                "num_batches_tracked"):
            consumed.add(k)
    # replay the mapping to record what _convert_backbone read
    n_conv = 3 if bottleneck else 2
    consumed.update({"conv1.weight"})
    consumed.update({f"bn1.{s}" for s in
                     ("weight", "bias", "running_mean", "running_var")})
    for _, tp, has_down in _backbone_mapping(stage_sizes, bottleneck):
        for ci in range(n_conv):
            consumed.add(f"{tp}.conv{ci + 1}.weight")
            consumed.update({f"{tp}.bn{ci + 1}.{s}" for s in
                             ("weight", "bias", "running_mean",
                              "running_var")})
        if has_down:
            consumed.add(f"{tp}.downsample.0.weight")
            consumed.update({f"{tp}.downsample.1.{s}" for s in
                             ("weight", "bias", "running_mean",
                              "running_var")})
    leftover = set(sd) - consumed
    if leftover:
        raise KeyError(f"unconsumed tensors for arch '{arch}': "
                       f"{sorted(leftover)[:8]}"
                       f"{' ...' if len(leftover) > 8 else ''}")
    return out["params"], out["batch_stats"]


def load_imagenet_backbone(variables: dict, pth_path_or_sd,
                           arch: str = "resnet18") -> dict:
    """Initialize the backbone of a PVNet variables tree from an ImageNet
    checkpoint, keeping the decoder heads fresh.

    This is the reference's standard initialization: every training run
    starts from model_zoo ImageNet weights for the backbone while the
    decoder/heads are randomly initialized (ref resnet.py:223-280,
    model_repository.py:12-26). ``pth_path_or_sd`` is a .pth path (torch
    CPU load) or an already-loaded ``{name: ndarray}`` state_dict in
    torchvision's exact key layout.

    Strict on both sides: every checkpoint tensor must be consumed (see
    :func:`convert_imagenet_backbone`) and every backbone param/stat in
    ``variables`` must be overwritten with a shape-matching tensor.
    Returns a new variables dict (input not mutated).
    """
    import jax

    if isinstance(pth_path_or_sd, (str,)):
        import torch
        payload = torch.load(pth_path_or_sd, map_location="cpu",
                             weights_only=False)
        sd = payload.get("net", payload) if isinstance(payload, dict) \
            else payload
        sd = {k: v.numpy() for k, v in sd.items()}
    else:
        sd = {k: np.asarray(v) for k, v in pth_path_or_sd.items()}

    params_flat, stats_flat = convert_imagenet_backbone(sd, arch)
    new_params = jax.tree_util.tree_map(np.asarray, variables["params"])
    new_stats = jax.tree_util.tree_map(np.asarray,
                                       variables["batch_stats"])

    def apply_flat(tree, flat, what):
        written = 0
        for path, v in flat.items():
            parts = path.split("/")
            node = tree
            for p in parts[:-1]:
                if p not in node:
                    raise KeyError(f"model has no {what} module {path}")
                node = node[p]
            if parts[-1] not in node:
                raise KeyError(f"model has no {what} leaf {path}")
            if tuple(node[parts[-1]].shape) != tuple(v.shape):
                raise ValueError(f"{what} shape mismatch at {path}: model "
                                 f"{node[parts[-1]].shape} vs ckpt {v.shape}")
            node[parts[-1]] = v.astype(node[parts[-1]].dtype)
            written += 1
        return written

    apply_flat(new_params, params_flat, "param")
    apply_flat(new_stats, stats_flat, "batch_stat")

    # every backbone tensor in the model must now come from the checkpoint
    bb_params = jax.tree_util.tree_leaves(
        variables["params"]["ResNetBackbone_0"])
    bb_stats = jax.tree_util.tree_leaves(
        variables["batch_stats"]["ResNetBackbone_0"])
    n_needed = len(bb_params) + len(bb_stats)
    n_have = len(params_flat) + len(stats_flat)
    if n_have != n_needed:
        raise ValueError(f"backbone coverage mismatch: checkpoint supplied "
                         f"{n_have} tensors, model backbone has {n_needed}")

    out = dict(variables)
    out["params"] = new_params
    out["batch_stats"] = new_stats
    return out


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
