"""Data layer tests against a generated miniature LINEMOD tree: PLY IO,
DB builders, pose-frame round trips, augmentation geometry invariants,
vertex-target host/device parity, samplers and the prefetch pipeline."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import AugConfig, LINEMOD_K, PathConfig
from pvnet_tpu.data import augment as A
from pvnet_tpu.data.dataset import (ImageSizeBatchSampler, PoseDataset,
                                    Prefetcher, VotingType, collate)
from pvnet_tpu.data.linemod import LineModImageDB, LineModModelDB
from pvnet_tpu.data.ply import PlyMesh, load_ply, save_ply_ascii
from pvnet_tpu.data.pose_transforms import project_np
from pvnet_tpu.data.synthetic import (generate_synthetic_linemod,
                                      make_duck_mesh)
from pvnet_tpu.data.vertex import (compute_vertex_targets,
                                   compute_vertex_targets_np)
from pvnet_tpu.ops.fps import farthest_point_sampling


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    root = tmp_path_factory.mktemp("data")
    # native 480x640: LINEMOD_K's principal point must be on-image
    paths = generate_synthetic_linemod(str(root), "duck", num_images=8)
    return paths


class TestPly:
    def test_roundtrip_ascii(self, tmp_path):
        mesh = make_duck_mesh(n_theta=4, n_phi=6)
        p = str(tmp_path / "m.ply")
        save_ply_ascii(p, mesh)
        back = load_ply(p)
        np.testing.assert_allclose(back.vertices, mesh.vertices, atol=1e-5)
        np.testing.assert_array_equal(back.faces, mesh.faces)
        np.testing.assert_array_equal(back.colors, mesh.colors)


class TestFPS:
    def test_spread_and_count(self, rng):
        pts = rng.randn(500, 3).astype(np.float32)
        out = farthest_point_sampling(pts, 8, init_center=True)
        assert out.shape == (8, 3)
        # FPS points should be far apart: min pairwise distance must beat
        # random selection handily
        d = np.linalg.norm(out[None] - out[:, None], axis=-1)
        d += np.eye(8) * 1e9
        rand = pts[rng.choice(500, 8, replace=False)]
        dr = np.linalg.norm(rand[None] - rand[:, None], axis=-1)
        dr += np.eye(8) * 1e9
        assert d.min() > dr.min()


class TestModelDB(object):
    def test_corners_center_diameter(self, synth):
        db = LineModModelDB(synth)
        corners = db.get_corners_3d("duck")
        assert corners.shape == (8, 3)
        v = db.get_ply_model("duck")
        np.testing.assert_allclose(corners.min(0), v.min(0), atol=1e-5)
        np.testing.assert_allclose(corners.max(0), v.max(0), atol=1e-5)
        center = db.get_centers_3d("duck")
        np.testing.assert_allclose(center, (v.min(0) + v.max(0)) / 2,
                                   atol=1e-5)
        d = db.get_diameter("duck")
        assert d == pytest.approx(np.linalg.norm(v.max(0) - v.min(0)),
                                  rel=1e-3)

    def test_farthest_keypoints_generated(self, synth):
        db = LineModModelDB(synth)
        far = db.get_farthest_3d("duck", 8)
        assert far.shape == (8, 3)
        # persisted for next time (ref farthest.txt caching)
        assert os.path.exists(os.path.join(synth.linemod_dir, "duck",
                                           "farthest.txt"))

    def test_small_bbox(self, synth):
        db = LineModModelDB(synth)
        sb = db.get_small_bbox("duck")
        c = db.get_corners_3d("duck")
        center = c.mean(0)
        np.testing.assert_allclose(sb - center, (c - center) * 2 / 3,
                                   atol=1e-6)


class TestImageDB:
    def test_real_set_records(self, synth):
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        assert len(db.real_set) == 8
        rec = db.real_set[0]
        for key in ("rgb_pth", "dpt_pth", "RT", "corners", "farthest",
                    "center", "small_bbox", "van_pts"):
            assert key in rec, key
        assert rec["RT"].shape == (3, 4)
        assert len(db.train_real_set) == 4
        assert len(db.test_real_set) + len(db.val_real_set) == 4

    def test_pose_roundtrip_projects_inside_mask(self, synth):
        """The stored blender-frame pose must project the model into the
        rendered mask (validates orig->blender conversion)."""
        from PIL import Image
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        mdb = LineModModelDB(synth)
        model = mdb.get_ply_model("duck")
        rec = db.real_set[0]
        uv = project_np(model, rec["RT"], LINEMOD_K)
        mask = np.array(Image.open(
            os.path.join(synth.linemod_dir, rec["dpt_pth"])))
        ys, xs = np.nonzero(mask)
        cx, cy = xs.mean(), ys.mean()
        pu, pv = uv[:, 0].mean(), uv[:, 1].mean()
        assert abs(pu - cx) < 8 and abs(pv - cy) < 8, (pu, cx, pv, cy)

    def test_posedb_cache_hit(self, synth):
        db1 = LineModImageDB("duck", has_render_set=False,
                             has_fuse_set=False, paths=synth)
        # second construction must come from the pickle cache
        assert os.path.exists(os.path.join(synth.linemod_dir, "posedb",
                                           "duck_real.pkl"))
        db2 = LineModImageDB("duck", has_render_set=False,
                             has_fuse_set=False, paths=synth)
        assert len(db2.real_set) == len(db1.real_set)


class TestVertexTargets:
    def test_np_jnp_parity(self, rng):
        mask = (rng.rand(24, 32) < 0.3).astype(np.int32)
        hcoords = np.concatenate(
            [rng.uniform(0, 32, (5, 2)), np.ones((5, 1))],
            1).astype(np.float32)
        ref = compute_vertex_targets_np(mask, hcoords)
        dev = np.asarray(compute_vertex_targets(
            jnp.asarray(mask)[None], jnp.asarray(hcoords)[None])[0])
        np.testing.assert_allclose(dev, ref, atol=1e-5)

    def test_unit_norm_inside_mask(self, rng):
        mask = np.zeros((20, 20), np.int32)
        mask[5:15, 5:15] = 1
        hcoords = np.array([[30.0, 30.0, 1.0]], np.float32)
        v = compute_vertex_targets_np(mask, hcoords).reshape(20, 20, 1, 2)
        norms = np.linalg.norm(v[mask == 1], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        assert np.all(v[mask == 0] == 0)


class TestAugment:
    def _fixture(self, rng):
        img = rng.randint(0, 255, (60, 80, 3)).astype(np.uint8)
        mask = np.zeros((60, 80), np.int32)
        mask[20:40, 30:60] = 1
        kp = np.array([[40.0, 30.0, 1.0], [55.0, 25.0, 1.0]], np.float32)
        return img, mask, kp

    def test_rotate_instance_keypoints_follow(self, rng):
        img, mask, kp = self._fixture(rng)
        np_rng = np.random.RandomState(0)
        img2, mask2, kp2 = A.rotate_instance(img, mask, kp.copy(), -30, 30,
                                             np_rng)
        assert mask2.sum() > 0.8 * mask.sum()
        # centroid approximately fixed (rotation is about the centroid)
        ys, xs = np.nonzero(mask)
        ys2, xs2 = np.nonzero(mask2)
        assert abs(xs.mean() - xs2.mean()) < 2
        assert abs(ys.mean() - ys2.mean()) < 2

    def test_flip_involution(self, rng):
        img, mask, kp = self._fixture(rng)
        img2, mask2, kp2 = A.flip(*A.flip(img, mask, kp.copy()))
        np.testing.assert_array_equal(np.asarray(img2), img)
        np.testing.assert_allclose(kp2, kp, atol=1e-4)

    def test_crop_resize_v1_keypoints_consistent(self, rng):
        """After crop+resize, transformed keypoints must still sit on the
        instance: verify via mask centroid tracking of the center point."""
        img, mask, kp = self._fixture(rng)
        ys, xs = np.nonzero(mask)
        center_kp = np.array([[xs.mean(), ys.mean(), 1.0]], np.float32)
        np_rng = np.random.RandomState(1)
        img2, mask2, kp2 = A.crop_resize_instance_v1(
            img, mask, center_kp, 48, 64, 0.8, 0.8, 1.2, np_rng)
        assert img2.shape == (48, 64, 3)
        ys2, xs2 = np.nonzero(mask2)
        assert abs(kp2[0, 0] - xs2.mean()) < 3
        assert abs(kp2[0, 1] - ys2.mean()) < 3

    def test_color_jitter_preserves_shape_dtype(self, rng):
        img = rng.randint(0, 255, (32, 32, 3)).astype(np.uint8)
        out = A.color_jitter(img, 0.1, 0.1, 0.05, 0.05,
                             np.random.RandomState(0))
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_mask_out_instance(self, rng):
        img, mask, kp = self._fixture(rng)
        img2, mask2 = A.mask_out_instance(img, mask, 0.3, 0.5,
                                          np.random.RandomState(2))
        assert mask2.sum() <= mask.sum()


class TestDatasetPipeline:
    def test_getitem_and_collate(self, synth):
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        ds = PoseDataset(db.train_real_set, synth.linemod_dir,
                         VotingType.Farthest, augment=True,
                         aug_cfg=AugConfig(hmin=64, hmax=96, wmin=64,
                                           wmax=96))
        s = ds[(0, 64, 96)]
        assert s.rgb.shape == (64, 96, 3)
        assert s.mask.shape == (64, 96)
        assert s.hcoords.shape == (9, 3)
        batch = collate([ds[(0, 64, 96)], ds[(1, 64, 96)]])
        assert batch["image"].shape == (2, 64, 96, 3)
        assert batch["vertex_weights"].shape == (2, 64, 96, 1)

    def test_cache_images_identical_samples(self, synth):
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        plain = PoseDataset(db.test_real_set, synth.linemod_dir,
                            VotingType.Farthest, augment=False)
        cached = PoseDataset(db.test_real_set, synth.linemod_dir,
                             VotingType.Farthest, augment=False,
                             cache_images=True)
        a = plain[(0, 0, 0)]
        b1 = cached[(0, 0, 0)]      # miss: fills the cache
        b2 = cached[(0, 0, 0)]      # hit
        np.testing.assert_array_equal(a.rgb, b1.rgb)
        np.testing.assert_array_equal(b1.rgb, b2.rgb)
        np.testing.assert_array_equal(b1.mask, b2.mask)
        assert 0 in cached._cache

    def test_eval_mode_no_resize(self, synth):
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        ds = PoseDataset(db.test_real_set, synth.linemod_dir,
                         VotingType.Farthest, augment=False)
        s = ds[(0, 0, 0)]          # eval ignores target size
        assert s.rgb.shape == (480, 640, 3)
        # keypoints match the record's projected farthest+center
        rec = db.test_real_set[0]
        expect = VotingType.get_data_pts_2d(VotingType.Farthest, rec)
        np.testing.assert_allclose(s.hcoords, expect, atol=1e-5)

    def test_sampler_buckets(self):
        cfg = AugConfig(hmin=256, hmax=480, wmin=256, wmax=640)
        sampler = ImageSizeBatchSampler(range(30), 8, aug_cfg=cfg,
                                        buckets=[(256, 256), (320, 448)],
                                        seed=0)
        batches = list(sampler)
        assert sum(len(b) for b in batches) == 30
        for b in batches:
            h, w = b[0][1], b[0][2]
            assert (h, w) in [(256, 256), (320, 448)]
            assert all((x[1], x[2]) == (h, w) for x in b)

    def test_sampler_full_grid(self):
        cfg = AugConfig()
        sampler = ImageSizeBatchSampler(range(20), 4, aug_cfg=cfg, seed=1)
        for b in sampler:
            h, w = b[0][1], b[0][2]
            assert 256 <= h <= 480 and h % 8 == 0
            assert 256 <= w <= 640 and w % 8 == 0

    def test_prefetcher_order_and_content(self, synth):
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        cfg = AugConfig(hmin=64, hmax=64, wmin=96, wmax=96)
        ds = PoseDataset(db.train_real_set, synth.linemod_dir,
                         VotingType.Farthest, augment=True, aug_cfg=cfg)
        sampler = ImageSizeBatchSampler(range(len(ds)), 2, aug_cfg=cfg,
                                        shuffle=False, seed=0)
        batches = list(Prefetcher(ds, sampler, num_threads=2))
        assert len(batches) == 2
        assert batches[0]["image"].shape == (2, 64, 96, 3)

    def test_prefetcher_early_exit_releases_workers(self, synth):
        """Breaking out of the iterator (as calibrate_quant does) must not
        leave worker threads pinned on the bounded queue — they'd leak a
        thread + decoded batches per early exit (ADVICE r3)."""
        import threading
        import time as _time
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        cfg = AugConfig(hmin=64, hmax=64, wmin=96, wmax=96)
        ds = PoseDataset(db.train_real_set, synth.linemod_dir,
                         VotingType.Farthest, augment=True, aug_cfg=cfg)
        base = threading.active_count()
        for _ in range(5):
            sampler = ImageSizeBatchSampler(range(len(ds)), 1, aug_cfg=cfg,
                                            shuffle=False, seed=0)
            # prefetch=1 so with >2 batches a worker would block in put()
            it = iter(Prefetcher(ds, sampler, num_threads=2, prefetch=1))
            next(it)
            it.close()   # what GC does when the consumer breaks early
        deadline = _time.time() + 5.0
        while threading.active_count() > base and _time.time() < deadline:
            _time.sleep(0.05)
        assert threading.active_count() <= base


class TestVotingType:
    def test_vote_nums(self):
        assert VotingType.vote_num("BB8") == 8
        assert VotingType.vote_num("BB8C") == 9
        assert VotingType.vote_num("Farthest") == 9
        assert VotingType.vote_num("Farthest4") == 5
        assert VotingType.vote_num("Farthest12") == 13
        assert VotingType.vote_num("Farthest16") == 17

    def test_pts_3d_matches_2d_projection(self, synth):
        """get_pts_3d and get_data_pts_2d must be consistent: projecting the
        3D points with the record pose gives the 2D targets."""
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        mdb = LineModModelDB(synth)
        rec = db.real_set[0]
        pts3d = VotingType.get_pts_3d(VotingType.Farthest, "duck", mdb)
        uv = project_np(pts3d, rec["RT"], LINEMOD_K)
        h2d = VotingType.get_data_pts_2d(VotingType.Farthest, rec)
        np.testing.assert_allclose(uv, h2d[:, :2], atol=1e-3)


class TestFusedAug:
    def _fixture(self, rng):
        img = rng.randint(0, 255, (480, 640, 3)).astype(np.uint8)
        mask = np.zeros((480, 640), np.int32)
        mask[180:300, 250:400] = 1
        kp = np.array([[300.0, 220.0, 1.0], [380.0, 280.0, 1.0]],
                      np.float32)
        return img, mask, kp

    class _FixedRng:
        """Deterministic rng stub feeding preset transform params into
        both augmentation paths so they can be compared directly."""

        def __init__(self, uniforms, randints):
            self.u = list(uniforms)
            self.r = list(randints)

        def uniform(self, lo, hi, *a):
            return float(np.clip(self.u.pop(0), lo, hi))

        def randint(self, lo, hi=None):
            v = self.r.pop(0)
            if hi is None:
                lo, hi = 0, lo
            return int(np.clip(v, lo, hi - 1))

        def random(self):
            return 0.9

    def test_matches_reference_path_same_params(self, rng):
        """Under identical (degree, ratio, crop offsets) the fused warp
        must equal rotate_instance + crop_resize_instance_v1: keypoints to
        float precision, masks to boundary-interpolation IoU."""
        img, mask, kp = self._fixture(rng)
        for deg, ratio, hb, wb in [(12.0, 1.0, 150, 200),
                                   (-20.0, 0.9, 160, 230),
                                   (25.0, 1.15, 140, 180)]:
            i1, m1, k1 = A.fused_rotate_crop_resize(
                img, mask, kp.copy(), 256, 256, -30, 30, 0.8, 0.8, 1.2,
                self._FixedRng([deg, ratio], [hb, wb]))
            i2, m2, k2 = A.rotate_instance(img, mask, kp.copy(), -30, 30,
                                           self._FixedRng([deg], []))
            i2, m2, k2 = A.crop_resize_instance_v1(
                i2, m2, k2, 256, 256, 0.8, 0.8, 1.2,
                self._FixedRng([ratio], [hb, wb]))
            np.testing.assert_allclose(k1, k2, atol=1e-4)
            inter = np.logical_and(m1 > 0, m2 > 0).sum()
            union = np.logical_or(m1 > 0, m2 > 0).sum()
            assert inter / max(union, 1) > 0.97

    def test_dataset_fast_path_runs(self, synth):
        db = LineModImageDB("duck", has_render_set=False,
                            has_fuse_set=False, paths=synth)
        cfg = AugConfig(hmin=96, hmax=96, wmin=96, wmax=96)
        ds = PoseDataset(db.train_real_set, synth.linemod_dir,
                         VotingType.Farthest, augment=True, aug_cfg=cfg,
                         fast_aug=True)
        s = ds[(0, 96, 96)]
        assert s.rgb.shape == (96, 96, 3)
        assert s.mask.sum() > 0


def test_read_rgb_tolerates_truncated_jpeg(tmp_path):
    # parity with the reference's ImageFile.LOAD_TRUNCATED_IMAGES=True
    # (ref data_utils.py:25): a JPEG cut mid-stream still decodes
    import io
    from PIL import Image
    from pvnet_tpu.data.linemod import read_rgb_np
    img = (np.random.RandomState(0).rand(48, 64, 3) * 255).astype(np.uint8)
    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="JPEG")
    data = buf.getvalue()
    p = tmp_path / "trunc.jpg"
    p.write_bytes(data[:len(data) * 2 // 3])
    out = read_rgb_np(str(p))
    assert out.shape == (48, 64, 3) and out.dtype == np.uint8
