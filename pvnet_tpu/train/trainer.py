"""Data-parallel training step, optimizer and LR schedule.

Replaces the reference's torch training loop machinery
(ref tools/train_linemod.py:132-175, 255-347): Adam at lr 1e-3
(ref :260), stepped decay x0.5 every 20 epochs with a 1e-5 floor
(ref lib/utils/net_utils.py:272-281), and DataParallel replica scatter
(ref :258) — here a pjit-sharded step over a ``data`` mesh axis where XLA
emits the gradient all-reduce over ICI. BatchNorm statistics are computed
over the global sharded batch (sync-BN; a strict upgrade over
DataParallel's per-replica stats).
"""
from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from flax import core, struct
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pvnet_tpu.config import TrainConfig
from pvnet_tpu.train.loss import total_loss


class TrainState(struct.PyTreeNode):
    """Model + optimizer state (ref checkpoints carry net/optim/epoch,
    net_utils.py:124-130)."""
    step: jnp.ndarray
    params: core.FrozenDict
    batch_stats: core.FrozenDict
    opt_state: optax.OptState
    apply_fn: Callable = struct.field(pytree_node=False)
    tx: optax.GradientTransformation = struct.field(pytree_node=False)


def lr_for_epoch(cfg: TrainConfig, epoch: int) -> float:
    """Step-decay schedule (ref net_utils.py:272-281): lr0 * rate^(epoch //
    decay_epoch), floored at lr_min."""
    lr = cfg.lr * (cfg.lr_decay_rate ** (epoch // cfg.lr_decay_epoch))
    return max(lr, cfg.lr_min)


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    """Adam with an injectable learning rate (set per epoch by the loop)."""
    return optax.inject_hyperparams(optax.adam)(learning_rate=cfg.lr)


def create_train_state(model, cfg: TrainConfig, input_shape,
                       rng: jax.Array) -> TrainState:
    variables = model.init(rng, jnp.zeros(input_shape, jnp.float32),
                           train=False)
    tx = make_optimizer(cfg)
    params = variables["params"]
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables.get("batch_stats", core.FrozenDict()),
        opt_state=tx.init(params),
        apply_fn=model.apply,
        tx=tx,
    )


def set_learning_rate(state: TrainState, lr: float) -> TrainState:
    """Write the per-epoch LR into the injected hyperparams."""
    opt_state = state.opt_state
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    return state.replace(opt_state=opt_state)


def _batch_vertex(batch: Dict[str, jnp.ndarray], use_motion: bool,
                  layout: str = "NHWC") -> jnp.ndarray:
    """Vertex targets: precomputed, or generated on device from hcoords
    inside the jitted step (never eagerly — per-op dispatch through the
    TPU tunnel costs seconds per batch). layout='NCHW' emits/transposes to
    channel-major [b, vd, h, w] for the NCHW-head loss."""
    if "vertex" in batch:
        v = batch["vertex"]
        return jnp.transpose(v, (0, 3, 1, 2)) if layout == "NCHW" else v
    if batch["hcoords"].ndim == 4:      # [b, C, k, 3]: multi-class labels
        assert not use_motion, "motion model + multi-class unsupported"
        from pvnet_tpu.data.vertex import compute_vertex_targets_multiclass
        v = compute_vertex_targets_multiclass(batch["mask"],
                                              batch["hcoords"])
        return jnp.transpose(v, (0, 3, 1, 2)) if layout == "NCHW" else v
    from pvnet_tpu.data.vertex import compute_vertex_targets
    return compute_vertex_targets(batch["mask"], batch["hcoords"],
                                  use_motion, layout=layout)


def _apply_device_aug(batch: Dict[str, jnp.ndarray], rng: jax.Array,
                      aug_cfg, aug_hw, image_layout: str = "NHWC"
                      ) -> Dict[str, jnp.ndarray]:
    """Run the jittable augmentation inside the step (TPU-native input
    pipeline: the host ships raw pixels, the accelerator does the warps).
    batch must carry raw 0..255 images; 'ignore' [b] optionally masks the
    vertex loss (fuse-set multi-scale filtering, ref linemod_dataset)."""
    from pvnet_tpu.data.augment_device import augment_batch
    image, mask, hcoords = augment_batch(
        batch["image"], batch["mask"], batch["hcoords"], rng, aug_hw,
        aug_cfg, out_layout=image_layout)
    vw = (mask > 0)[..., None].astype(jnp.float32)
    if "ignore" in batch:
        vw = vw * (1.0 - batch["ignore"])[:, None, None, None]
    out = dict(batch, image=image, mask=mask, hcoords=hcoords,
               vertex_weights=vw)
    out.pop("vertex", None)  # targets must be recomputed post-warp
    return out


def train_step(state: TrainState, batch: Dict[str, jnp.ndarray],
               rng: Optional[jax.Array] = None,
               vertex_loss_ratio: float = 1.0, use_motion: bool = False,
               aug_cfg=None, aug_hw: Optional[Tuple[int, int]] = None,
               head_layout: str = "NHWC", input_layout: str = "NHWC"
               ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """One optimization step. batch keys: image [b,h,w,3], mask [b,h,w],
    vertex_weights [b,h,w,1], and vertex [b,h,w,vd] or hcoords [b,k,3].

    With ``aug_cfg``/``aug_hw`` set (and ``rng`` provided), the batch is
    expected raw (unnormalized 0..255 images, full frames) and the whole
    augmentation pipeline runs on device as part of this jitted step.

    ``head_layout`` must match the model's: 'NCHW' runs the whole loss in
    channel-major layout (targets generated as [b, vd, h, w], losses with
    channel_axis=1) — the TPU-fast form, since full-res NHWC c=18/c=2
    tensors are lane-padded 7x/64x in HBM (see train/loss.py).

    ``input_layout`` must likewise match the model's: 'NCHW' makes the
    device augmentation emit the image channel-major [b, 3, h, w]
    (augment_batch out_layout) for a model built with
    input_layout='NCHW' — avoiding the c=3-minor NHWC materialization
    between augmentation and conv1. Requires aug_cfg (the raw-batch
    path); precomputed-batch callers ship NHWC images."""
    if aug_cfg is not None:
        batch = _apply_device_aug(batch, rng, aug_cfg, aug_hw,
                                  image_layout=input_layout)
    else:
        assert input_layout == "NHWC", \
            "input_layout='NCHW' requires the on-device aug path"
    vertex = _batch_vertex(batch, use_motion, head_layout)
    ca = 1 if head_layout == "NCHW" else -1
    vw = batch["vertex_weights"]
    if head_layout == "NCHW":
        # [b,h,w,1] -> [b,1,h,w] is a pure reshape (same element order)
        vw = vw.reshape(vw.shape[0], 1, *vw.shape[1:3])

    def loss_fn(params):
        (seg_pred, ver_pred), mutated = state.apply_fn(
            {"params": params, "batch_stats": state.batch_stats},
            batch["image"], train=True, mutable=["batch_stats"])
        loss, metrics = total_loss(seg_pred, ver_pred, batch["mask"],
                                   vertex, vw,
                                   vertex_loss_ratio, channel_axis=ca)
        return loss, (metrics, mutated["batch_stats"])

    grads, (metrics, new_stats) = jax.grad(loss_fn, has_aux=True)(
        state.params)
    updates, new_opt_state = state.tx.update(grads, state.opt_state,
                                             state.params)
    new_params = optax.apply_updates(state.params, updates)
    new_state = state.replace(step=state.step + 1, params=new_params,
                              batch_stats=new_stats,
                              opt_state=new_opt_state)
    return new_state, metrics


def train_step_from_data(state: TrainState, data: Dict[str, jnp.ndarray],
                         idx: jnp.ndarray,
                         rng: Optional[jax.Array] = None,
                         vertex_loss_ratio: float = 1.0,
                         use_motion: bool = False,
                         aug_cfg=None,
                         aug_hw: Optional[Tuple[int, int]] = None,
                         head_layout: str = "NHWC",
                         input_layout: str = "NHWC"
                         ) -> Tuple[TrainState, Dict[str, jnp.ndarray]]:
    """Device-resident input pipeline: one step that gathers its minibatch
    from the WHOLE training set living in HBM.

    data: {image [N,h,w,3] uint8, mask [N,h,w] uint8, hcoords [N,k,3]
    float32, ignore [N] float32} — uint8 frames for the full set are small
    (LINEMOD-scale: ~2 GB), so keeping them resident removes the host from
    the steady-state input path entirely; the only per-step host->device
    transfer is ``idx`` [b] int32. This matters doubly on this backend:
    the tunnel's per-transfer host staging buffers are never freed
    (~22 MB/step leak with host batches — see CLAUDE.md), and single-core
    JPEG decode can't feed the chip. Augmentation still runs on device
    (aug_cfg/aug_hw, data.augment_device)."""
    batch = {"image": data["image"][idx], "mask": data["mask"][idx],
             "hcoords": data["hcoords"][idx]}
    if "ignore" in data:
        batch["ignore"] = data["ignore"][idx]
    return train_step(state, batch, rng, vertex_loss_ratio, use_motion,
                      aug_cfg, aug_hw, head_layout, input_layout)


def make_sharded_train_step_from_data(mesh: Mesh,
                                      vertex_loss_ratio: float = 1.0,
                                      donate: bool = True,
                                      use_motion: bool = False,
                                      aug_cfg=None,
                                      aug_hw: Optional[Tuple[int, int]] = None,
                                      head_layout: str = "NHWC",
                                      input_layout: str = "NHWC"):
    """Data-parallel variant of train_step_from_data: the resident dataset
    is replicated per chip, ``idx`` is split over the 'data' axis, so each
    chip gathers its own shard of the minibatch with no collectives."""
    repl = NamedSharding(mesh, P())
    data_s = NamedSharding(mesh, P("data"))
    step = functools.partial(train_step_from_data,
                             vertex_loss_ratio=vertex_loss_ratio,
                             use_motion=use_motion,
                             aug_cfg=aug_cfg, aug_hw=aug_hw,
                             head_layout=head_layout,
                             input_layout=input_layout)
    return jax.jit(
        step,
        in_shardings=(repl, repl, data_s, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def eval_forward(state: TrainState, image: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inference forward pass with frozen batch statistics."""
    return state.apply_fn(
        {"params": state.params, "batch_stats": state.batch_stats},
        image, train=False)


def eval_step(state: TrainState, batch: Dict[str, jnp.ndarray],
              vertex_loss_ratio: float = 1.0, use_motion: bool = False,
              head_layout: str = "NHWC") -> Dict[str, jnp.ndarray]:
    """Loss/metrics without parameter updates (ref val(), :177-205)."""
    vertex = _batch_vertex(batch, use_motion, head_layout)
    seg_pred, ver_pred = eval_forward(state, batch["image"])
    vw = batch["vertex_weights"]
    if head_layout == "NCHW":
        vw = vw.reshape(vw.shape[0], 1, *vw.shape[1:3])
    _, metrics = total_loss(seg_pred, ver_pred, batch["mask"],
                            vertex, vw, vertex_loss_ratio,
                            channel_axis=1 if head_layout == "NCHW" else -1)
    return metrics


def make_sharded_train_step(mesh: Mesh, vertex_loss_ratio: float = 1.0,
                            donate: bool = True, use_motion: bool = False,
                            aug_cfg=None,
                            aug_hw: Optional[Tuple[int, int]] = None,
                            head_layout: str = "NHWC",
                            input_layout: str = "NHWC"):
    """Jit the train step with data-parallel shardings over ``mesh``.

    State is replicated; batch arrays are split on dim 0 over the 'data'
    axis. XLA inserts the gradient/batch-stat all-reduces. With
    ``aug_cfg``/``aug_hw``, the returned step takes (state, batch, rng)
    and performs on-device augmentation first.
    """
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))

    step = functools.partial(train_step,
                             vertex_loss_ratio=vertex_loss_ratio,
                             use_motion=use_motion,
                             aug_cfg=aug_cfg, aug_hw=aug_hw,
                             head_layout=head_layout,
                             input_layout=input_layout)
    if aug_cfg is not None:
        return jax.jit(
            step,
            in_shardings=(repl, data, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,) if donate else (),
        )
    return jax.jit(
        lambda state, batch: step(state, batch),
        in_shardings=(repl, data),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate else (),
    )


def make_sharded_eval_step(mesh: Mesh, vertex_loss_ratio: float = 1.0,
                           use_motion: bool = False,
                           head_layout: str = "NHWC"):
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P("data"))
    step = functools.partial(eval_step,
                             vertex_loss_ratio=vertex_loss_ratio,
                             use_motion=use_motion,
                             head_layout=head_layout)
    return jax.jit(step, in_shardings=(repl, data), out_shardings=repl)
