"""Full training / evaluation loops (ref tools/train_linemod.py:132-347).

Orchestrates: DB construction, datasets with augmentation, the sharded
train step, per-epoch validation, optional pose evaluation with the
accumulating Evaluator, checkpointing, LR schedule, and recording.

The device-side contract: batches carry (image, mask, hcoords); vertex
targets are computed on device (data.vertex.compute_vertex_targets) right
before the train step, replacing the reference's per-sample host numpy
(ref linemod_dataset.py:68-81).
"""
from __future__ import annotations

import os
import time
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from pvnet_tpu.config import (AugConfig, PathConfig, TrainConfig,
                              INTRINSIC_MATRICES, LINEMOD_K)
from pvnet_tpu.data.dataset import (ImageSizeBatchSampler, PoseDataset,
                                    Prefetcher, VotingType, collate)
from pvnet_tpu.data.linemod import LineModModelDB
from pvnet_tpu.eval.evaluator import Evaluator, ObjectMeta
from pvnet_tpu.models.pvnet import build_model
from pvnet_tpu.parallel import make_mesh, replicate, shard_batch
from pvnet_tpu.train import trainer as trainer_mod
from pvnet_tpu.train.checkpoint import load_model, save_model
from pvnet_tpu.train.recorder import AverageMeter, Recorder
from pvnet_tpu import pipeline as pl_mod


def _device_batch(batch: Dict[str, np.ndarray], vote_num: int,
                  use_motion: bool = False) -> Dict[str, jnp.ndarray]:
    """Host batch -> device arrays. Vertex targets stay as hcoords; the
    jitted step expands them on device (train/trainer._batch_vertex) —
    never eagerly, which would cost seconds of per-op tunnel dispatch."""
    out = {
        "image": jnp.asarray(batch["image"]),
        "mask": jnp.asarray(batch["mask"]),
    }
    if "vertex_weights" in batch:
        out["vertex_weights"] = jnp.asarray(batch["vertex_weights"])
    if "vertex" in batch:
        out["vertex"] = jnp.asarray(batch["vertex"])
    else:
        out["hcoords"] = jnp.asarray(batch["hcoords"])
    return out


class TrainLoop:
    """End-to-end trainer for one object class."""

    def __init__(self, cfg: TrainConfig, cls_name: str,
                 paths: Optional[PathConfig] = None,
                 buckets: Optional[list] = None,
                 use_mesh: bool = True):
        self.cfg = cfg
        self.cls_name = cls_name
        self.paths = paths or PathConfig()
        self.vote_type = cfg.vote_type
        self.vote_num = VotingType.vote_num(cfg.vote_type)
        model_kw = dict(quant_stages=tuple(cfg.quant_stages),
                        quant_mode=cfg.quant_mode)
        if cfg.quant_decoder:
            # only the PVNet family takes it; build_model forwards **kw
            model_kw["quant_decoder"] = True
        if cfg.head_layout != "NHWC":
            model_kw["head_layout"] = cfg.head_layout
        if cfg.input_layout != "NHWC":
            model_kw["input_layout"] = cfg.input_layout
        self.model = build_model(cfg.network, ver_dim=self.vote_num * 2,
                                 seg_dim=2,
                                 dtype=jnp.bfloat16 if cfg.bf16
                                 else jnp.float32, **model_kw)
        self.model_name = f"{cls_name}_{cfg.model_name}"
        self.model_dir = os.path.join(self.paths.model_dir, self.model_name)
        self.recorder = Recorder(os.path.join(self.paths.record_dir,
                                              self.model_name))
        self.mesh = make_mesh() if use_mesh else None
        self.buckets = buckets
        self._train_step = None
        self._eval_forward_cache = {}
        # calibrated activation scales for quant_mode='static'
        # (ops/quant_conv.calibrate); merged into eval variables when set
        self.quant_collection = None

    # -- state ------------------------------------------------------------
    def init_state(self, input_hw=(256, 256),
                   imagenet_pth: Optional[str] = None
                   ) -> trainer_mod.TrainState:
        """Fresh train state; with ``imagenet_pth``, the backbone is
        initialized from a torchvision/model_zoo ImageNet checkpoint while
        the decoder heads stay random — the reference's standard training
        init (ref resnet.py:223-280)."""
        state = trainer_mod.create_train_state(
            self.model, self.cfg,
            (1, input_hw[0], input_hw[1], 3), jax.random.PRNGKey(self.cfg.seed))
        if imagenet_pth:
            from pvnet_tpu.utils.torch_convert import load_imagenet_backbone
            arch = self.cfg.network.split("_")[0]       # resnet18_8s -> ...
            new_vars = load_imagenet_backbone(
                {"params": state.params, "batch_stats": state.batch_stats},
                imagenet_pth, arch=arch)
            state = state.replace(params=new_vars["params"],
                                  batch_stats=new_vars["batch_stats"])
        if self.mesh is not None:
            state = replicate(state, self.mesh)
        return state

    def resume(self, state):
        return load_model(state, self.model_dir,
                          epoch=-1 if self.cfg.resume else 0)

    # -- steps ------------------------------------------------------------
    def train_step_fn(self, aug_hw=None, from_data: bool = False):
        """Jitted train step; with cfg.device_aug, one cached step per
        target (h, w) taking (state, batch, rng). ``from_data``: the
        device-resident variant taking (state, data, idx, rng)
        (trainer.train_step_from_data)."""
        import functools
        if from_data:
            if not hasattr(self, "_data_steps"):
                self._data_steps = {}
            if aug_hw not in self._data_steps:
                if self.mesh is not None:
                    step = trainer_mod.make_sharded_train_step_from_data(
                        self.mesh, self.cfg.vertex_loss_ratio, donate=False,
                        use_motion=self.cfg.motion_model,
                        aug_cfg=self.cfg.aug_cfg, aug_hw=aug_hw,
                        head_layout=self.cfg.head_layout,
                        input_layout=self.cfg.input_layout)
                else:
                    step = jax.jit(functools.partial(
                        trainer_mod.train_step_from_data,
                        vertex_loss_ratio=self.cfg.vertex_loss_ratio,
                        use_motion=self.cfg.motion_model,
                        aug_cfg=self.cfg.aug_cfg, aug_hw=aug_hw,
                        head_layout=self.cfg.head_layout,
                        input_layout=self.cfg.input_layout))
                self._data_steps[aug_hw] = step
            return self._data_steps[aug_hw]
        if aug_hw is not None:
            if not hasattr(self, "_aug_steps"):
                self._aug_steps = {}
            if aug_hw not in self._aug_steps:
                if self.mesh is not None:
                    step = trainer_mod.make_sharded_train_step(
                        self.mesh, self.cfg.vertex_loss_ratio, donate=False,
                        use_motion=self.cfg.motion_model,
                        aug_cfg=self.cfg.aug_cfg, aug_hw=aug_hw,
                        head_layout=self.cfg.head_layout,
                        input_layout=self.cfg.input_layout)
                else:
                    step = jax.jit(functools.partial(
                        trainer_mod.train_step,
                        vertex_loss_ratio=self.cfg.vertex_loss_ratio,
                        use_motion=self.cfg.motion_model,
                        aug_cfg=self.cfg.aug_cfg, aug_hw=aug_hw,
                        head_layout=self.cfg.head_layout,
                        input_layout=self.cfg.input_layout))
                self._aug_steps[aug_hw] = step
            return self._aug_steps[aug_hw]
        if self._train_step is None:
            if self.mesh is not None:
                self._train_step = trainer_mod.make_sharded_train_step(
                    self.mesh, self.cfg.vertex_loss_ratio, donate=False,
                    use_motion=self.cfg.motion_model,
                    head_layout=self.cfg.head_layout)
            else:
                self._train_step = jax.jit(functools.partial(
                    trainer_mod.train_step,
                    vertex_loss_ratio=self.cfg.vertex_loss_ratio,
                    use_motion=self.cfg.motion_model,
                    head_layout=self.cfg.head_layout))
        return self._train_step

    def build_device_dataset(self, train_db, data_prefix: str):
        """Decode the whole training set once and park it in HBM as uint8
        (trainer.train_step_from_data's ``data``). Requires uniform image
        sizes (LINEMOD frames are all 480x640). ~2 GB for 2048 frames —
        the one-time transfer replaces ~15 MB/step of host->device traffic
        (and the tunnel's never-freed per-transfer staging, CLAUDE.md)."""
        ds = PoseDataset(train_db, data_prefix, self.vote_type,
                         augment=False, aug_cfg=self.cfg.aug_cfg,
                         use_motion=self.cfg.motion_model, raw=True)
        n = len(train_db)
        s0 = ds[(0, 0, 0)]
        images = np.empty((n,) + s0.rgb.shape, np.uint8)
        masks = np.empty((n,) + s0.mask.shape, np.uint8)
        hcoords = np.empty((n,) + s0.hcoords.shape, np.float32)
        ignore = np.empty((n,), np.float32)
        for i in range(n):
            s = ds[(i, 0, 0)]
            if s.rgb.shape != s0.rgb.shape:
                raise ValueError(
                    f"device_data needs uniform image sizes; record {i} is "
                    f"{s.rgb.shape} vs {s0.rgb.shape}")
            images[i] = s.rgb
            masks[i] = s.mask
            hcoords[i] = s.hcoords
            ignore[i] = float(s.ignore_vertex)
        data = {"image": jnp.asarray(images), "mask": jnp.asarray(masks),
                "hcoords": jnp.asarray(hcoords),
                "ignore": jnp.asarray(ignore)}
        if self.mesh is not None:
            data = replicate(data, self.mesh)
        jax.block_until_ready(data["image"])
        return data

    def train_epoch_from_data(self, state, data, sampler, epoch: int):
        """Device-resident variant of train_epoch: the sampler yields
        (index, h, w) batches; only the index vector crosses the host
        boundary each step."""
        meters = {k: AverageMeter() for k in
                  ("loss", "seg_loss", "ver_loss", "precision", "recall")}
        begin = time.time()
        size = len(sampler)
        seed = np.random.SeedSequence([self.cfg.seed, 7919 * (epoch + 1)])
        aug_keys = seed.generate_state(2 * size).astype(
            np.uint32).reshape(size, 2)
        pending = []
        for idx, batch_ihw in enumerate(sampler):
            ids = np.asarray([i for i, _, _ in batch_ihw], np.int32)
            aug_hw = (batch_ihw[0][1], batch_ihw[0][2])
            state, metrics = self.train_step_fn(aug_hw, from_data=True)(
                state, data, ids, aug_keys[idx % size])
            pending.append(metrics)
            if idx % self.cfg.loss_rec_step == 0:
                for met in pending:
                    for k, m in meters.items():
                        m.update(float(met[k]))
                pending.clear()
                step = epoch * size + idx
                self.recorder.rec_loss_batch(
                    {f"train/scalar/{k}": m.avg for k, m in meters.items()},
                    step, epoch)
                for m in meters.values():
                    m.reset()
        try:
            rss_gb = int(open("/proc/self/statm").read().split()[1]) \
                * 4096 / 1e9
        except OSError:  # pragma: no cover
            rss_gb = float("nan")
        print(f"epoch {epoch} training cost {time.time() - begin:.1f} s "
              f"(host rss {rss_gb:.1f} GB, "
              f"{len(jax.live_arrays())} live arrays)", flush=True)
        return state

    def train_epoch(self, state, loader, epoch: int):
        """(ref train() :132-175)"""
        meters = {k: AverageMeter() for k in
                  ("loss", "seg_loss", "ver_loss", "precision", "recall")}
        step_fn = None if self.cfg.device_aug else self.train_step_fn()
        begin = time.time()
        size = len(loader)
        aug_keys = None
        if self.cfg.device_aug:
            # pre-split per-step keys as host numpy: a per-step fold_in
            # would be an eager device op (seconds each through the tunnel)
            seed = np.random.SeedSequence(
                [self.cfg.seed, 7919 * (epoch + 1)])
            aug_keys = seed.generate_state(2 * size).astype(
                np.uint32).reshape(size, 2)
        pending = []     # device metric dicts; synced only at record steps
        for idx, batch in enumerate(loader):
            aug_hw = None
            if "out_hw" in batch:
                aug_hw = tuple(int(x) for x in batch.pop("out_hw"))
            dev = _device_batch(batch, self.vote_num,
                                self.cfg.motion_model)
            if self.cfg.device_aug:
                dev["ignore"] = jnp.asarray(batch["ignore"])
            if self.mesh is not None:
                dev = shard_batch(dev, self.mesh)
            if self.cfg.device_aug:
                state, metrics = self.train_step_fn(aug_hw)(
                    state, dev, aug_keys[idx % size])
            else:
                state, metrics = step_fn(state, dev)
            pending.append(metrics)
            if idx % self.cfg.loss_rec_step == 0:
                for met in pending:
                    for k, m in meters.items():
                        m.update(float(met[k]))
                pending.clear()
                step = epoch * size + idx
                self.recorder.rec_loss_batch(
                    {f"train/scalar/{k}": m.avg for k, m in meters.items()},
                    step, epoch)
                for m in meters.values():
                    m.reset()
        try:
            rss_gb = int(open("/proc/self/statm").read().split()[1]) \
                * 4096 / 1e9
        except OSError:  # pragma: no cover
            rss_gb = float("nan")
        print(f"epoch {epoch} training cost {time.time() - begin:.1f} s "
              f"(host rss {rss_gb:.1f} GB, "
              f"{len(jax.live_arrays())} live arrays)", flush=True)
        return state

    def eval_pipeline(self, hw, batch: int, uncertainty: bool,
                      vote_params=None, tail_depth: int = 0,
                      tail_quant: bool = False, vote_impl=None):
        """Jitted forward+vote per image shape (cached).

        tail_depth 0 = plain full-resolution path; 1-3 route the decoder
        tail through the packed lattices (pipeline.fused_tail_foreground)
        — exact-math-equivalent, faster on TPU. Falls back to the plain
        path when the model or image shape can't take the packed tail
        (non-PVNet networks; dims not divisible by 8, e.g. truncated-split
        crops)."""
        from pvnet_tpu.models.pvnet import PVNet
        if tail_depth > 0 and (not isinstance(self.model, PVNet)
                               or hw[0] % 8 or hw[1] % 8):
            tail_depth = 0
        params = vote_params or pl_mod.VoteParams()
        key = (hw, batch, uncertainty, params, tail_depth, tail_quant,
               vote_impl)
        if key not in self._eval_forward_cache:

            def fwd(variables, image, rngkey):
                if tail_depth > 0:
                    from pvnet_tpu.ops import voting
                    k0, k1, k2 = jax.random.split(rngkey, 3)
                    fg = pl_mod.fused_tail_foreground(
                        self.model.apply, variables, image, params.max_num,
                        k0, dtype=self.model.dtype, tail_depth=tail_depth,
                        tail_quant=tail_quant)
                    kps = voting.ransac_voting_v3_from_fg(
                        fg, k1, hyp_num=params.hyp_num,
                        inlier_thresh=params.inlier_thresh,
                        min_num=params.min_num, impl=vote_impl)
                    if uncertainty:
                        _, cov = voting.estimate_voting_distribution_from_fg(
                            fg, kps, k2,
                            hyp_num=params.uncertainty_hyp_num,
                            inlier_thresh=params.inlier_thresh,
                            impl=vote_impl)
                        return kps, cov
                    return kps
                mask, vertex = pl_mod.predict_fields(
                    self.model.apply, variables, image)
                if uncertainty:
                    return pl_mod.keypoints_with_covariance(
                        mask, vertex, rngkey, params, impl=vote_impl)
                return pl_mod.keypoints_from_fields(mask, vertex, rngkey,
                                                    params,
                                                    impl=vote_impl)

            self._eval_forward_cache[key] = jax.jit(fwd)
        return self._eval_forward_cache[key]

    def calibrate_quant(self, state, loader, num_batches: int = 2):
        """Calibrate static int8 activation scales (quant_mode='static')
        on a few loader batches; stores the ``quant`` collection for every
        subsequent validate()/eval_pipeline() call. The same float
        checkpoint serves both modes (ops/quant_conv.Conv docstring)."""
        from pvnet_tpu.ops import quant_conv
        calib = self.model.clone(quant_mode="calibrate")
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        images = []
        for bidx, batch in enumerate(loader):
            if bidx >= num_batches:
                break
            dev = _device_batch(batch, self.vote_num, self.cfg.motion_model)
            images.append(dev["image"])
        self.quant_collection = jax.device_put(
            quant_conv.calibrate(calib, variables, images, train=False))
        return self.quant_collection

    def validate(self, state, loader, epoch: int, prefix: str = "val",
                 evaluate_pose: bool = False, uncertainty: bool = False,
                 use_camera_intrinsic: bool = False,
                 evaluator: Optional[Evaluator] = None,
                 save_inter_dir: Optional[str] = None,
                 vote_params=None, tail_depth: int = 0,
                 tail_quant: bool = False, vote_impl=None):
        """(ref val() :177-253) — loss metrics always; pose metrics when
        evaluate_pose."""
        import functools
        meters = {k: AverageMeter() for k in
                  ("loss", "seg_loss", "ver_loss", "precision", "recall")}
        # one jit wrapper per loop (a fresh wrapper per call would reload
        # a new executable host-side every epoch)
        if not hasattr(self, "_eval_loss_fn"):
            self._eval_loss_fn = jax.jit(functools.partial(
                trainer_mod.eval_step,
                vertex_loss_ratio=self.cfg.vertex_loss_ratio,
                use_motion=self.cfg.motion_model,
                head_layout=self.cfg.head_layout))
        eval_loss = self._eval_loss_fn
        key = jax.random.PRNGKey(0)
        begin = time.time()

        for bidx, batch in enumerate(loader):
            dev = _device_batch(batch, self.vote_num, self.cfg.motion_model)
            metrics = eval_loss(state, dev)
            for k, m in meters.items():
                m.update(float(metrics[k]))

            if evaluate_pose and evaluator is not None:
                b, h, w = dev["mask"].shape
                fwd = self.eval_pipeline((h, w), b, uncertainty,
                                         vote_params, tail_depth,
                                         tail_quant, vote_impl)
                variables = {"params": state.params,
                             "batch_stats": state.batch_stats}
                if self.quant_collection is not None:
                    variables["quant"] = self.quant_collection
                key = jax.random.fold_in(key, bidx)
                Ks = (np.asarray(batch["K"], np.float32)
                      if use_camera_intrinsic
                      else np.broadcast_to(LINEMOD_K, (b, 3, 3)))
                if uncertainty:
                    mean, cov = fwd(variables, dev["image"], key)
                    evaluator.evaluate_uncertainty_batch(
                        np.asarray(mean), np.asarray(cov), batch["pose"],
                        Ks)
                else:
                    kps = np.asarray(fwd(variables, dev["image"], key))
                    evaluator.evaluate_batch(kps, batch["pose"], Ks)

                if save_inter_dir is not None:
                    self._save_inter(save_inter_dir, bidx, state, batch,
                                     dev)

        losses = {f"{prefix}/scalar/{k}": m.avg for k, m in meters.items()}
        if evaluate_pose and evaluator is not None:
            proj, add, cm = evaluator.average_precision(verbose=True)
            losses[f"{prefix}/scalar/projection_error"] = proj
            losses[f"{prefix}/scalar/add"] = add
            losses[f"{prefix}/scalar/cm"] = cm
        self.recorder.rec_loss_batch(losses, epoch, epoch, prefix)
        print(f"epoch {epoch} {prefix} cost {time.time() - begin:.1f} s",
              flush=True)
        return losses

    def _save_inter(self, out_dir: str, idx: int, state, batch, dev):
        """Dump predicted/GT masks + rgb + pose for inspection
        (ref train_linemod.py:221-229, --save_inter_result)."""
        from PIL import Image
        from pvnet_tpu.utils.viz import imagenet_to_uint8
        os.makedirs(out_dir, exist_ok=True)
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        mask_pr, _ = jax.jit(lambda v, x: pl_mod.predict_fields(
            self.model.apply, v, x))(variables, dev["image"])
        Image.fromarray(
            (np.asarray(mask_pr[0]) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{idx}_mask_pr.png"))
        Image.fromarray(
            (np.asarray(batch["mask"][0]) * 255).astype(np.uint8)).save(
            os.path.join(out_dir, f"{idx}_mask_gt.png"))
        Image.fromarray(imagenet_to_uint8(batch["image"][0])).save(
            os.path.join(out_dir, f"{idx}_rgb.png"))
        import pickle
        with open(os.path.join(out_dir, f"{idx}_pose.pkl"), "wb") as f:
            pickle.dump(batch["pose"][0], f)

    # -- orchestration ----------------------------------------------------
    def make_loaders(self, train_db: Sequence[dict],
                     val_db: Sequence[dict], data_prefix: str,
                     num_threads: int = 4):
        aug = self.cfg.aug_cfg
        train_set = PoseDataset(train_db, data_prefix, self.vote_type,
                                augment=not self.cfg.device_aug,
                                aug_cfg=aug,
                                use_motion=self.cfg.motion_model,
                                seed=self.cfg.seed,
                                raw=self.cfg.device_aug,
                                cache_images=self.cfg.cache_images)
        train_sampler = ImageSizeBatchSampler(
            range(len(train_set)), self.cfg.train_batch_size,
            drop_last=True, aug_cfg=aug, buckets=self.buckets,
            seed=self.cfg.seed)
        train_loader = Prefetcher(train_set, train_sampler,
                                  num_threads=num_threads)
        val_loader = self.make_val_loader(val_db, data_prefix, num_threads)
        return train_loader, val_loader

    def make_val_loader(self, val_db: Sequence[dict], data_prefix: str,
                        num_threads: int = 4):
        aug = self.cfg.aug_cfg
        val_set = PoseDataset(val_db, data_prefix, self.vote_type,
                              augment=False, aug_cfg=aug,
                              use_motion=self.cfg.motion_model)
        val_sampler = ImageSizeBatchSampler(
            range(len(val_set)), self.cfg.test_batch_size,
            aug_cfg=aug, shuffle=False)
        return Prefetcher(val_set, val_sampler, num_threads=num_threads)

    def object_meta(self) -> ObjectMeta:
        modeldb = LineModModelDB(self.paths)
        from pvnet_tpu.config import SYMMETRIC_CLS_NAMES
        return ObjectMeta(
            points_3d=VotingType.get_pts_3d(
                self.vote_type, self.cls_name, modeldb).astype(np.float32),
            model_pts=modeldb.get_ply_model(self.cls_name).astype(
                np.float32),
            diameter=modeldb.get_diameter(self.cls_name),
            symmetric=self.cls_name in SYMMETRIC_CLS_NAMES,
            name=self.cls_name)

    def fit(self, train_db, val_db, data_prefix: str,
            epochs: Optional[int] = None, num_threads: int = 4,
            imagenet_pth: Optional[str] = None):
        """Full training run with resume + per-epoch checkpointing
        (ref train_net() :305-347)."""
        state = self.init_state(imagenet_pth=imagenet_pth)
        state, begin_epoch = self.resume(state)
        device_data = None
        train_sampler = None
        if self.cfg.device_data:
            if not self.cfg.device_aug:
                raise ValueError("device_data requires device_aug "
                                 "(vertex targets are computed on device "
                                 "post-warp)")
            device_data = self.build_device_dataset(train_db, data_prefix)
            train_sampler = ImageSizeBatchSampler(
                range(len(train_db)), self.cfg.train_batch_size,
                drop_last=True, aug_cfg=self.cfg.aug_cfg,
                buckets=self.buckets, seed=self.cfg.seed)
            val_loader = self.make_val_loader(val_db, data_prefix,
                                              num_threads)
        else:
            train_loader, val_loader = self.make_loaders(
                train_db, val_db, data_prefix, num_threads)
        end_epoch = epochs if epochs is not None else self.cfg.epoch_num
        for epoch in range(begin_epoch, end_epoch):
            lr = trainer_mod.lr_for_epoch(self.cfg, epoch)
            state = trainer_mod.set_learning_rate(state, lr)
            if device_data is not None:
                state = self.train_epoch_from_data(state, device_data,
                                                   train_sampler, epoch)
            else:
                state = self.train_epoch(state, train_loader, epoch)
            do_eval = (self.cfg.eval_epoch
                       and epoch % self.cfg.eval_inter == 0
                       and epoch >= self.cfg.eval_epoch_begin)
            do_val = (do_eval or epoch % self.cfg.val_inter == 0
                      or epoch == end_epoch - 1)
            # save BEFORE the val pass: a val-time interruption (the axon
            # tunnel's per-client hang strikes mid-val in practice) must
            # not lose a completed training epoch — resume restarts from
            # the epoch after the last saved one.
            save_model(state, epoch, self.model_dir,
                       keep=self.cfg.checkpoint_keep)
            if do_val:
                evaluator = Evaluator(self.object_meta()) if do_eval \
                    else None
                self.validate(state, val_loader, epoch,
                              evaluate_pose=do_eval, evaluator=evaluator)
        return state
