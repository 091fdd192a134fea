"""Export trained network weights to a single flax msgpack file.

Pulls params + batch_stats out of an orbax training checkpoint directory
(the per-epoch layout train/checkpoint.py writes) and serializes them with
flax.serialization — a compact, dependency-free artifact that bench.py and
demos can load without the optimizer state or orbax machinery.

  python tools/export_weights.py --model_dir data/model/duck_synthetic_train \
      --out assets/duck_ckpt.msgpack [--bf16]
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--epoch", type=int, default=-1, help="-1 = latest")
    ap.add_argument("--cfg_file", default="configs/synthetic_train.json")
    ap.add_argument("--bf16", action="store_true", default=True,
                    help="store weights as bfloat16 (halves the file; the "
                         "inference pipeline computes in bf16 anyway)")
    ap.add_argument("--no-bf16", dest="bf16", action="store_false")
    args = ap.parse_args()

    from pvnet_tpu.utils.cache import pin_platform_from_env
    pin_platform_from_env()
    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    from flax import serialization

    from pvnet_tpu.config import TrainConfig
    from pvnet_tpu.data.dataset import VotingType
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.train import trainer as trainer_mod
    from pvnet_tpu.train.checkpoint import load_model

    cfg = TrainConfig.from_json(args.cfg_file) \
        if os.path.exists(args.cfg_file) else TrainConfig()
    vote_num = VotingType.vote_num(cfg.vote_type)
    model = build_model(cfg.network, ver_dim=vote_num * 2, seg_dim=2)
    state = trainer_mod.create_train_state(
        model, cfg, (1, 64, 64, 3), jax.random.PRNGKey(0))
    state, epoch = load_model(state, args.model_dir, args.epoch)
    if epoch == 0:
        print(f"no checkpoint found in {args.model_dir}", file=sys.stderr)
        return 1

    def cast(x):
        x = np.asarray(x)
        if args.bf16 and x.dtype == np.float32:
            return np.asarray(jnp.asarray(x, jnp.bfloat16))
        return x

    payload = {
        "params": jax.tree_util.tree_map(cast, state.params),
        "batch_stats": jax.tree_util.tree_map(cast, state.batch_stats),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "wb") as f:
        f.write(serialization.to_bytes(payload))
    size = os.path.getsize(args.out) / 1e6
    print(f"wrote {args.out} ({size:.1f} MB, epoch {epoch - 1})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
