"""Orbax checkpointing with the reference's per-epoch layout.

The reference writes ``data/model/{cls}_{model}/{epoch}.pth`` containing
{'net', 'optim', 'epoch'} every epoch and restores the max (or requested)
epoch (ref lib/utils/net_utils.py:92-130, train_linemod.py:307-308,347).
Here each epoch is an orbax step directory under the same per-class model
dir; ``load_epoch=-1`` restores the latest.
"""
from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from pvnet_tpu.train.trainer import TrainState


def _manager(model_dir: str, keep: int = 10) -> ocp.CheckpointManager:
    options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
    return ocp.CheckpointManager(os.path.abspath(model_dir), options=options)


def save_model(state: TrainState, epoch: int, model_dir: str,
               keep: int = 10) -> None:
    """Save params/batch_stats/opt_state/step under epoch number
    (ref net_utils.py:124-130)."""
    mgr = _manager(model_dir, keep)
    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    mgr.save(epoch, args=ocp.args.StandardSave(payload))
    mgr.wait_until_finished()
    mgr.close()


def load_model(state: TrainState, model_dir: str, epoch: int = -1
               ) -> Tuple[TrainState, int]:
    """Restore into ``state``; returns (state, begin_epoch).

    Missing dir / no checkpoints -> epoch 0 with the input state, matching
    the reference's silent cold start (ref net_utils.py:92-98). epoch=-1
    picks the latest.
    """
    if not os.path.exists(model_dir):
        return state, 0
    mgr = _manager(model_dir)
    steps = mgr.all_steps()
    if not steps:
        mgr.close()
        return state, 0
    target = max(steps) if epoch == -1 else epoch
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(target,
                           args=ocp.args.StandardRestore(template))
    mgr.close()
    new_state = state.replace(
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
        step=restored["step"],
    )
    return new_state, target + 1


def load_net(state: TrainState, model_dir: str) -> Tuple[TrainState, int]:
    """Restore network weights only (params + batch_stats), keeping the
    optimizer state — the reference's eval-time loader
    (ref net_utils.py:load_net :110-122). Returns (state, epoch + 1),
    or (state, 0) when no checkpoint exists."""
    if not os.path.exists(model_dir):
        return state, 0
    mgr = _manager(model_dir)
    steps = mgr.all_steps()
    if not steps:
        mgr.close()
        return state, 0
    target = max(steps)
    template = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "step": state.step,
    }
    restored = mgr.restore(target,
                           args=ocp.args.StandardRestore(template))
    mgr.close()
    return state.replace(params=restored["params"],
                         batch_stats=restored["batch_stats"]), target + 1
