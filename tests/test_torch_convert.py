"""Torch checkpoint conversion tests.

Numerical parity of the conv/bn translation is checked against torch
functional ops; the full-tree mapping is checked structurally against a
synthesized reference-layout state_dict (the real cat_demo/199.pth is not in
the snapshot) and numerically end-to-end via a torch re-execution of a
single conv+bn stage.
"""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.utils import torch_convert as tc


def synth_reference_state_dict(rng):
    """Random tensors with the reference Resnet18_8s module names/shapes
    (ref model_repository.py:7-58, resnet.py:116-220)."""
    sd = {}

    def conv(name, cout, cin, k):
        sd[name + ".weight"] = rng.randn(cout, cin, k, k).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5

    bp = "resnet18_8s."
    conv(bp + "conv1", 64, 3, 7)
    bn(bp + "bn1", 64)
    inplanes = 64
    for stage, (n, planes, stride) in enumerate(
            zip((2, 2, 2, 2), (64, 128, 256, 512), (1, 2, 2, 2))):
        for i in range(n):
            pre = f"{bp}layer{stage + 1}.{i}"
            conv(pre + ".conv1", planes, inplanes if i == 0 else planes, 3)
            bn(pre + ".bn1", planes)
            conv(pre + ".conv2", planes, planes, 3)
            bn(pre + ".bn2", planes)
            if i == 0 and (stride != 1 or inplanes != planes):
                conv(pre + ".downsample.0", planes, inplanes, 1)
                bn(pre + ".downsample.1", planes)
        inplanes = planes
    conv(bp + "fc.0", 256, 512, 3)
    bn(bp + "fc.1", 256)
    conv("conv8s.0", 128, 256 + 128, 3)
    bn("conv8s.1", 128)
    conv("conv4s.0", 64, 128 + 64, 3)
    bn("conv4s.1", 64)
    conv("conv2s.0", 32, 64 + 64, 3)
    bn("conv2s.1", 32)
    conv("convraw.0", 32, 32 + 3, 3)
    bn("convraw.1", 32)
    conv("convraw.3", 20, 32, 1)
    sd["convraw.3.bias"] = rng.randn(20).astype(np.float32) * 0.1
    return sd


class TestConversion:
    def test_full_tree_maps_and_runs(self, rng):
        sd = synth_reference_state_dict(rng)
        params_flat, stats_flat = tc.convert_state_dict(sd)
        params = tc.unflatten(params_flat)
        stats = tc.unflatten(stats_flat)
        model = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
        variables = tc.validate_against_model(model, params, stats)
        x = jnp.asarray(rng.randn(1, 32, 32, 3).astype(np.float32))
        seg, ver = model.apply(variables, x, train=False)
        assert seg.shape == (1, 32, 32, 2)
        assert np.all(np.isfinite(np.asarray(seg)))

    def test_conv_bn_numerics_match_torch(self, rng):
        """The stem conv+bn+relu of the converted model must match torch's
        functional computation on the same weights."""
        sd = synth_reference_state_dict(rng)
        params = tc.unflatten(tc.convert_state_dict(sd)[0])
        stats = tc.unflatten(tc.convert_state_dict(sd)[1])

        x = rng.randn(1, 16, 16, 3).astype(np.float32)
        tx = torch.from_numpy(x).permute(0, 3, 1, 2)
        w = torch.from_numpy(sd["resnet18_8s.conv1.weight"])
        ty = F.conv2d(tx, w, stride=2, padding=3)
        ty = F.batch_norm(
            ty, torch.from_numpy(sd["resnet18_8s.bn1.running_mean"]),
            torch.from_numpy(sd["resnet18_8s.bn1.running_var"]),
            torch.from_numpy(sd["resnet18_8s.bn1.weight"]),
            torch.from_numpy(sd["resnet18_8s.bn1.bias"]), False, 0.1, 1e-5)
        ty = F.relu(ty).permute(0, 2, 3, 1).numpy()

        # flax stem via the backbone module with converted weights
        from pvnet_tpu.models.resnet import resnet18_backbone
        backbone = resnet18_backbone()
        bvars = {
            "params": params["ResNetBackbone_0"],
            "batch_stats": stats["ResNetBackbone_0"],
        }
        x2s, *_ = backbone.apply(bvars, jnp.asarray(x), train=False)
        np.testing.assert_allclose(np.asarray(x2s), ty, rtol=1e-3,
                                   atol=1e-4)

    def test_missing_key_raises(self, rng):
        sd = synth_reference_state_dict(rng)
        del sd["conv8s.0.weight"]
        with pytest.raises(KeyError):
            tc.convert_state_dict(sd)


def synth_torchvision_state_dict(rng, arch="resnet18"):
    """Random tensors with torchvision's EXACT ImageNet checkpoint key set
    for resnet18/34/50 (incl. fc.weight/fc.bias and the
    num_batches_tracked counters torch.nn.BatchNorm2d serializes)."""
    stage_sizes, bottleneck = tc._ARCHS[arch]
    expansion = 4 if bottleneck else 1
    sd = {}

    def conv(name, cout, cin, k):
        # small scale keeps the 50-layer stack finite under random BN stats
        sd[name + ".weight"] = (rng.randn(cout, cin, k, k) * 0.05
                                ).astype(np.float32)

    def bn(name, c):
        sd[name + ".weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".bias"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_mean"] = rng.randn(c).astype(np.float32) * 0.1
        sd[name + ".running_var"] = rng.rand(c).astype(np.float32) + 0.5
        sd[name + ".num_batches_tracked"] = np.asarray(1000, np.int64)

    conv("conv1", 64, 3, 7)
    bn("bn1", 64)
    inplanes = 64
    for stage, (n, planes, stride) in enumerate(
            zip(stage_sizes, (64, 128, 256, 512), (1, 2, 2, 2))):
        for i in range(n):
            pre = f"layer{stage + 1}.{i}"
            cin = inplanes if i == 0 else planes * expansion
            if bottleneck:
                conv(pre + ".conv1", planes, cin, 1)
                bn(pre + ".bn1", planes)
                conv(pre + ".conv2", planes, planes, 3)
                bn(pre + ".bn2", planes)
                conv(pre + ".conv3", planes * 4, planes, 1)
                bn(pre + ".bn3", planes * 4)
            else:
                conv(pre + ".conv1", planes, cin, 3)
                bn(pre + ".bn1", planes)
                conv(pre + ".conv2", planes, planes, 3)
                bn(pre + ".bn2", planes)
            if i == 0 and (stride != 1 or inplanes != planes * expansion):
                conv(pre + ".downsample.0", planes * expansion, inplanes, 1)
                bn(pre + ".downsample.1", planes * expansion)
        inplanes = planes * expansion
    sd["fc.weight"] = rng.randn(1000, 512 * expansion).astype(np.float32)
    sd["fc.bias"] = rng.randn(1000).astype(np.float32)
    return sd


class TestImageNetBackbone:
    @pytest.mark.parametrize("arch,network", [("resnet18", "resnet18_8s"),
                                              ("resnet50", "resnet50_8s")])
    def test_every_tensor_consumed_and_backbone_overwritten(self, rng, arch,
                                                            network):
        sd = synth_torchvision_state_dict(rng, arch)
        model = build_model(network, ver_dim=18, seg_dim=2)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), train=False)
        new_vars = tc.load_imagenet_backbone(variables, sd, arch=arch)

        # backbone params all replaced with the checkpoint values
        stem = np.asarray(
            new_vars["params"]["ResNetBackbone_0"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(
            stem, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
        old_bb = jax.tree_util.tree_leaves(
            variables["params"]["ResNetBackbone_0"])
        new_bb = jax.tree_util.tree_leaves(
            new_vars["params"]["ResNetBackbone_0"])
        changed = sum(not np.allclose(np.asarray(a), np.asarray(b))
                      for a, b in zip(old_bb, new_bb))
        assert changed == len(old_bb)  # every backbone tensor consumed

        # decoder heads stay at their fresh init (ref resnet.py:223-280:
        # zoo weights for the backbone, random heads)
        for name in ("Conv_0", "Conv_1", "Conv_5"):
            np.testing.assert_array_equal(
                np.asarray(variables["params"][name]["kernel"]),
                np.asarray(new_vars["params"][name]["kernel"]))

        # batch stats too
        old_bs = jax.tree_util.tree_leaves(
            variables["batch_stats"]["ResNetBackbone_0"])
        new_bs = jax.tree_util.tree_leaves(
            new_vars["batch_stats"]["ResNetBackbone_0"])
        assert sum(not np.allclose(np.asarray(a), np.asarray(b))
                   for a, b in zip(old_bs, new_bs)) == len(old_bs)

        # and the result still runs
        seg, _ = model.apply(new_vars, jnp.zeros((1, 32, 32, 3)),
                             train=False)
        assert np.isfinite(np.asarray(seg)).all()

    def test_leftover_tensor_rejected(self, rng):
        sd = synth_torchvision_state_dict(rng)
        sd["layer9.0.conv1.weight"] = np.zeros((4, 4, 3, 3), np.float32)
        with pytest.raises(KeyError, match="unconsumed"):
            tc.convert_imagenet_backbone(sd, "resnet18")

    def test_missing_tensor_rejected(self, rng):
        sd = synth_torchvision_state_dict(rng)
        del sd["layer3.0.downsample.0.weight"]
        with pytest.raises(KeyError):
            tc.convert_imagenet_backbone(sd, "resnet18")

    def test_pth_roundtrip_one_command(self, rng, tmp_path):
        """The documented one-command path: torch.save a torchvision-layout
        .pth, point the loader at it."""
        sd = synth_torchvision_state_dict(rng)
        pth = str(tmp_path / "resnet18-imagenet.pth")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                    sd.items()}, pth)
        model = build_model("resnet18_8s", ver_dim=18)
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((1, 32, 32, 3)), train=False)
        new_vars = tc.load_imagenet_backbone(variables, pth, arch="resnet18")
        stem = np.asarray(
            new_vars["params"]["ResNetBackbone_0"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(
            stem, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))

    def test_train_loop_wiring(self, rng, tmp_path):
        """tools/train.py --imagenet_pth reaches the state through
        TrainLoop.init_state."""
        from pvnet_tpu.config import TrainConfig
        from pvnet_tpu.train.loop import TrainLoop
        sd = synth_torchvision_state_dict(rng)
        pth = str(tmp_path / "zoo.pth")
        torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in
                    sd.items()}, pth)
        cfg = TrainConfig()
        loop = TrainLoop(cfg, "cat", use_mesh=False)
        state = loop.init_state(imagenet_pth=pth)
        stem = np.asarray(
            state.params["ResNetBackbone_0"]["Conv_0"]["kernel"])
        np.testing.assert_allclose(
            stem, np.transpose(sd["conv1.weight"], (2, 3, 1, 0)),
            rtol=1e-6)
