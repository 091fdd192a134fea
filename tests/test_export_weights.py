"""tools/export_weights.py: orbax checkpoint -> flax msgpack round trip."""
import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np


def test_export_and_bench_load_roundtrip(tmp_path):
    from flax import serialization
    from pvnet_tpu.config import TrainConfig
    from pvnet_tpu.models.pvnet import build_model
    from pvnet_tpu.train import trainer as trainer_mod
    from pvnet_tpu.train.checkpoint import save_model

    cfg = TrainConfig()
    model = build_model(cfg.network, ver_dim=18, seg_dim=2)
    state = trainer_mod.create_train_state(model, cfg, (1, 32, 32, 3),
                                           jax.random.PRNGKey(0))
    model_dir = str(tmp_path / "ckpt")
    save_model(state, 3, model_dir)

    out = str(tmp_path / "weights.msgpack")
    r = subprocess.run(
        [sys.executable, "tools/export_weights.py", "--model_dir",
         model_dir, "--out", out, "--cfg_file", "nonexistent.json"],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr + r.stdout
    assert os.path.exists(out)

    # load the artifact the way bench.py does
    variables = model.init(jax.random.PRNGKey(1), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    with open(out, "rb") as f:
        restored = serialization.from_bytes(
            {"params": variables["params"],
             "batch_stats": variables["batch_stats"]}, f.read())
    stem = np.asarray(restored["params"]["ResNetBackbone_0"]["Conv_0"]
                      ["kernel"], np.float32)
    ref = np.asarray(state.params["ResNetBackbone_0"]["Conv_0"]["kernel"])
    np.testing.assert_allclose(stem, ref, rtol=1e-2, atol=1e-3)  # bf16 store

    # the restored weights drive a forward pass
    seg, _ = model.apply({"params": restored["params"],
                          "batch_stats": restored["batch_stats"]},
                         jnp.zeros((1, 32, 32, 3)), train=False)
    assert np.isfinite(np.asarray(seg)).all()
