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
