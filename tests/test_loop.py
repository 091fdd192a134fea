"""Integration tests of the full training loop on a miniature synthetic
dataset (CPU, tiny shapes): fit -> checkpoint -> resume -> validate with
pose evaluation."""
import os

import jax
import numpy as np
import pytest

from pvnet_tpu.config import AugConfig, TrainConfig
from pvnet_tpu.data.dataset import (ImageSizeBatchSampler, PoseDataset,
                                    Prefetcher)
from pvnet_tpu.data.linemod import LineModImageDB
from pvnet_tpu.data.synthetic import generate_synthetic_linemod
from pvnet_tpu.eval.evaluator import Evaluator
from pvnet_tpu.train.loop import TrainLoop


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("loopdata")
    paths = generate_synthetic_linemod(str(root), "duck", num_images=6)
    cfg = TrainConfig.from_dict({
        "model_name": "loop_test",
        "train_batch_size": 2,
        "test_batch_size": 2,
        "epoch_num": 2,
        "resume": True,
        "use_fuse": False,
        "loss_rec_step": 1,
        "aug_cfg": {"hmin": 64, "hmax": 64, "wmin": 64, "wmax": 64,
                    "jitter": False, "blur": False},
    })
    cfg.checkpoint_keep = 3
    return paths, cfg


class TestTrainLoop:
    def test_fit_resume_validate(self, setup):
        paths, cfg = setup
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        train_db = db.train_real_set
        val_db = db.val_real_set or db.test_real_set

        loop = TrainLoop(cfg, "duck", paths=paths, buckets=[(64, 64)],
                         use_mesh=False)
        state = loop.fit(train_db, val_db, paths.linemod_dir, epochs=2,
                         num_threads=1)
        assert int(state.step) > 0
        # checkpoints for epochs 0 and 1 exist
        from pvnet_tpu.train.checkpoint import load_model
        state2 = loop.init_state()
        state2, begin = load_model(state2, loop.model_dir)
        assert begin == 2

        # resume trains one more epoch from epoch 2
        state3 = loop.fit(train_db, val_db, paths.linemod_dir, epochs=3,
                          num_threads=1)
        state4 = loop.init_state()
        _, begin = load_model(state4, loop.model_dir)
        assert begin == 3

    def test_validate_with_pose_eval(self, setup):
        paths, cfg = setup
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        loop = TrainLoop(cfg, "duck", paths=paths, use_mesh=False)
        from pvnet_tpu.train.checkpoint import load_model
        state = loop.init_state()
        state, epoch = load_model(state, loop.model_dir)
        ds = PoseDataset(db.test_real_set, paths.linemod_dir, cfg.vote_type,
                         augment=False, aug_cfg=cfg.aug_cfg)
        sampler = ImageSizeBatchSampler(range(len(ds)), 2,
                                        aug_cfg=cfg.aug_cfg, shuffle=False)
        loader = Prefetcher(ds, sampler, num_threads=1)
        ev = Evaluator(loop.object_meta())
        losses = loop.validate(state, loader, epoch, "test",
                               evaluate_pose=True, evaluator=ev)
        # pose metrics recorded (untrained net -> near 0, but present)
        assert "test/scalar/add" in losses
        assert len(ev.add_recorder) == len(ds)
        assert np.isfinite(losses["test/scalar/loss"])


class TestValInter:
    def test_val_inter_skips_val_passes(self, setup, monkeypatch):
        """val_inter > 1 runs the val-loss pass only every N epochs (plus
        the final epoch); checkpoints still save every epoch."""
        import dataclasses
        paths, cfg = setup
        cfg = dataclasses.replace(cfg, model_name="valinter_test",
                                  val_inter=3)
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        loop = TrainLoop(cfg, "duck", paths=paths, buckets=[(64, 64)],
                         use_mesh=False)

        val_epochs = []
        orig_validate = TrainLoop.validate

        def spy(self, state, loader, epoch, *a, **kw):
            val_epochs.append(epoch)
            return orig_validate(self, state, loader, epoch, *a, **kw)

        monkeypatch.setattr(TrainLoop, "validate", spy)
        loop.fit(db.train_real_set, db.val_real_set or db.test_real_set,
                 paths.linemod_dir, epochs=5, num_threads=1)
        assert val_epochs == [0, 3, 4]   # every 3rd + the final epoch

        from pvnet_tpu.train.checkpoint import load_model
        state = loop.init_state()
        _, begin = load_model(state, loop.model_dir)
        assert begin == 5


class TestPackedEval:
    def test_validate_with_packed_tail(self, setup):
        """tail_depth=3 eval path: packed decoder feeds voting; metrics
        land like the plain path's (exact-math-equivalent tail)."""
        paths, cfg = setup
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        loop = TrainLoop(cfg, "duck", paths=paths, use_mesh=False)
        from pvnet_tpu.train.checkpoint import load_model
        state = loop.init_state()
        state, epoch = load_model(state, loop.model_dir)
        ds = PoseDataset(db.test_real_set, paths.linemod_dir, cfg.vote_type,
                         augment=False, aug_cfg=cfg.aug_cfg)
        sampler = ImageSizeBatchSampler(range(len(ds)), 2,
                                        aug_cfg=cfg.aug_cfg, shuffle=False)
        loader = Prefetcher(ds, sampler, num_threads=1)
        ev = Evaluator(loop.object_meta())
        losses = loop.validate(state, loader, epoch, "test",
                               evaluate_pose=True, evaluator=ev,
                               tail_depth=3)
        assert "test/scalar/add" in losses
        assert len(ev.add_recorder) == len(ds)

    def test_validate_static_quant(self, tmp_path_factory):
        """quant_mode='static' eval path: calibrate_quant stores the quant
        collection; validate merges it and pose eval runs (the float
        checkpoint restores into the quantized model unchanged). Own tiny
        64x64 dataset: XLA CPU executes int8 convs scalarized (~75x
        slower at 480x640 than 64x64 — minutes per batch), so the shared
        480x640 fixture is unusable here."""
        import dataclasses
        root = tmp_path_factory.mktemp("sqdata")
        paths = generate_synthetic_linemod(str(root), "duck", num_images=4,
                                           image_hw=(64, 64))
        cfg = TrainConfig.from_dict({
            "model_name": "sq_test", "test_batch_size": 2,
            "use_fuse": False,
            "aug_cfg": {"hmin": 64, "hmax": 64, "wmin": 64, "wmax": 64,
                        "jitter": False, "blur": False},
        })
        qcfg = dataclasses.replace(cfg, quant_stages=(2, 3),
                                   quant_mode="static")
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        loop = TrainLoop(qcfg, "duck", paths=paths, use_mesh=False)
        state = loop.init_state()
        ds = PoseDataset(db.test_real_set, paths.linemod_dir, cfg.vote_type,
                         augment=False, aug_cfg=cfg.aug_cfg)
        sampler = ImageSizeBatchSampler(range(len(ds)), 2,
                                        aug_cfg=cfg.aug_cfg, shuffle=False)
        loader = Prefetcher(ds, sampler, num_threads=1)
        quant = loop.calibrate_quant(state, loader, num_batches=1)
        amaxes = [float(v) for v in jax.tree_util.tree_leaves(quant)]
        assert amaxes and all(a > 0 for a in amaxes)
        loader2 = Prefetcher(ds, sampler, num_threads=1)
        ev = Evaluator(loop.object_meta())
        losses = loop.validate(state, loader2, 1, "sq",
                               evaluate_pose=True, evaluator=ev,
                               tail_depth=3)
        assert "sq/scalar/add" in losses
        assert np.isfinite(losses["sq/scalar/loss"])


class TestDeviceData:
    def test_fit_device_resident(self, setup):
        """device_data: the training set lives in HBM; fit runs epochs
        gathering minibatches by index (no per-step host batches)."""
        import dataclasses
        paths, cfg = setup
        cfg = dataclasses.replace(cfg, model_name="devdata_test",
                                  device_aug=True, device_data=True)
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        loop = TrainLoop(cfg, "duck", paths=paths, buckets=[(64, 64)],
                         use_mesh=False)
        state = loop.fit(db.train_real_set,
                         db.val_real_set or db.test_real_set,
                         paths.linemod_dir, epochs=1, num_threads=1)
        assert int(jax.device_get(state.step)) > 0

    def test_sharded_from_data_step(self):
        """make_sharded_train_step_from_data on the 8-device mesh: the
        resident set is replicated, idx split over 'data'."""
        import jax.numpy as jnp
        from pvnet_tpu.config import TrainConfig
        from pvnet_tpu.parallel import make_mesh, replicate
        from pvnet_tpu.train import trainer as trainer_mod

        cfg = TrainConfig()
        from pvnet_tpu.models.pvnet import build_model
        model = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
        state = trainer_mod.create_train_state(
            model, cfg, (8, 32, 32, 3), jax.random.PRNGKey(0))
        mesh = make_mesh()
        state = replicate(state, mesh)
        rng = np.random.RandomState(0)
        n = 12
        data = replicate({
            "image": jnp.asarray(rng.randint(0, 255, (n, 40, 40, 3)),
                                 jnp.uint8),
            "mask": jnp.asarray(rng.randint(0, 2, (n, 40, 40)), jnp.uint8),
            "hcoords": jnp.asarray(np.concatenate(
                [rng.rand(n, 9, 2) * 32, np.ones((n, 9, 1))], -1),
                jnp.float32),
            "ignore": jnp.zeros((n,), jnp.float32),
        }, mesh)
        step = trainer_mod.make_sharded_train_step_from_data(
            mesh, donate=False, aug_cfg=cfg.aug_cfg, aug_hw=(32, 32))
        idx = np.arange(8, dtype=np.int32)
        new_state, metrics = step(state, data, idx, np.array([0, 1],
                                                            np.uint32))
        assert np.isfinite(float(jax.device_get(metrics["loss"])))

    def test_device_data_requires_device_aug(self, setup):
        import dataclasses
        paths, cfg = setup
        cfg = dataclasses.replace(cfg, model_name="devdata_bad",
                                  device_data=True, device_aug=False)
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=paths)
        loop = TrainLoop(cfg, "duck", paths=paths, use_mesh=False)
        with pytest.raises(ValueError, match="device_aug"):
            loop.fit(db.train_real_set,
                     db.val_real_set or db.test_real_set,
                     paths.linemod_dir, epochs=1, num_threads=1)
