"""On-device augmentation vs the host cv2 pipeline.

The device path must apply the same transform family as the host
fused_rotate_crop_resize (itself reference-parity, see augment.py): given
the SAME affine matrix, the device warp must match cv2.warpAffine, and the
sampled parameter distributions must mirror the host ranges.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.config import AugConfig
from pvnet_tpu.data import augment_device as AD


def make_scene(h=96, w=128, seed=0):
    rng = np.random.RandomState(seed)
    img = rng.randint(0, 255, (h, w, 3)).astype(np.float32)
    mask = np.zeros((h, w), np.int32)
    mask[30:70, 40:90] = 1
    hcoords = np.array([[45.0, 35.0, 1.0], [80.0, 60.0, 1.0],
                        [60.0, 50.0, 1.0]], np.float32)
    return img, mask, hcoords


class TestWarp:
    def test_matches_cv2_bilinear_and_nearest(self):
        import cv2
        img, mask, _ = make_scene()
        M = np.array([[0.9, 0.2, -5.0], [-0.2, 0.9, 8.0]], np.float32)
        out_h, out_w = 80, 100
        ref_img = cv2.warpAffine(img, M, (out_w, out_h),
                                 flags=cv2.INTER_LINEAR,
                                 borderMode=cv2.BORDER_CONSTANT,
                                 borderValue=0)
        ref_mask = cv2.warpAffine(mask, M, (out_w, out_h),
                                  flags=cv2.INTER_NEAREST,
                                  borderMode=cv2.BORDER_CONSTANT,
                                  borderValue=0)
        got_img, got_mask = AD._warp_image(jnp.asarray(img),
                                           jnp.asarray(mask),
                                           jnp.asarray(M), out_h, out_w)
        got_img, got_mask = np.asarray(got_img), np.asarray(got_mask)
        # interiors match to interpolation rounding; allow a thin disagree
        # band at mask edges (cv2 rounds half-pixels differently)
        diff = np.abs(got_img - ref_img)
        assert np.percentile(diff, 99) < 2.0
        assert (got_mask != ref_mask).mean() < 0.02

    def test_u32_warp_matches_f32_warp(self):
        """The packed-word warp (uint8 fast path) must reproduce the f32
        warp exactly: u8 values are exact in f32 and both use identical
        tap/blend math."""
        img, mask, _ = make_scene()
        rng = np.random.RandomState(3)
        for _ in range(4):
            ang = rng.uniform(-0.6, 0.6)
            s = rng.uniform(0.8, 1.3)
            c, sn = s * np.cos(ang), s * np.sin(ang)
            M = np.array([[c, sn, rng.uniform(-20, 5)],
                          [-sn, c, rng.uniform(-5, 20)]], np.float32)
            out_h, out_w = 80, 96
            a_img, a_mask = AD._warp_image(
                jnp.asarray(img, jnp.float32), jnp.asarray(mask),
                jnp.asarray(M), out_h, out_w)
            b_img, b_mask = AD._warp_image_u32(
                jnp.asarray(img, jnp.uint8),
                jnp.asarray(mask, jnp.uint8),
                jnp.asarray(M), out_h, out_w)
            np.testing.assert_allclose(np.asarray(a_img),
                                       np.asarray(b_img),
                                       rtol=1e-5, atol=1e-3)
            np.testing.assert_array_equal(np.asarray(a_mask),
                                          np.asarray(b_mask))

    def test_augment_batch_u8_matches_f32(self):
        """augment_batch must produce identical results for uint8 and
        float32 input images (the u8 path routes through the packed
        warp)."""
        img, mask, hc = make_scene()
        cfg = AugConfig()
        key = jax.random.PRNGKey(5)
        imgs8 = jnp.asarray(img[None], jnp.uint8)
        imgsf = jnp.asarray(img[None], jnp.float32)
        masks = jnp.asarray(mask[None], jnp.int32)
        hcs = jnp.asarray(hc[None])
        a = AD.augment_batch(imgsf, masks, hcs, key, (64, 64), cfg)
        b = AD.augment_batch(imgs8, masks, hcs, key, (64, 64), cfg)
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-4, atol=1e-3)
        np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
        np.testing.assert_allclose(np.asarray(a[2]), np.asarray(b[2]),
                                   rtol=1e-5)

    def test_separable_warp_exact_without_rotation(self):
        """Rotation-free affines (crop/resize-only) make the two-pass
        warp bit-equivalent to one-pass bilinear (d=0 -> no slanted-line
        offset; see the _sep_pass design note)."""
        img, mask, _ = make_scene()
        rng = np.random.RandomState(11)
        for _ in range(4):
            s = rng.uniform(0.8, 1.3)
            M = np.array([[s, 0.0, rng.uniform(-20, 5)],
                          [0.0, s, rng.uniform(-5, 20)]], np.float32)
            a_img, a_mask = AD._warp_image(
                jnp.asarray(img, jnp.float32), jnp.asarray(mask),
                jnp.asarray(M), 80, 96)
            b_img, b_mask = AD._warp_batch_sep(
                jnp.asarray(img[None]), jnp.asarray(mask[None]),
                jnp.asarray(M[None]), 80, 96, s_max=1.6)
            np.testing.assert_allclose(np.asarray(a_img),
                                       np.asarray(b_img[0]),
                                       rtol=1e-4, atol=2e-3)
            np.testing.assert_array_equal(np.asarray(a_mask),
                                          np.asarray(b_mask[0]))

    def test_separable_warp_rotated(self):
        """With rotation the two-pass warp's vertical taps sit on a line
        slanted by (d/a) per column (<= 0.29 px at 30 deg) — on a smooth
        image the value difference vs one-pass bilinear is bounded by
        that offset times the local gradient; the nearest-mask disagrees
        only in a thin boundary band."""
        import cv2
        img, mask, _ = make_scene()
        smooth = cv2.GaussianBlur(img, (9, 9), 3)
        rng = np.random.RandomState(13)
        for _ in range(4):
            ang = rng.uniform(-0.5, 0.5)
            s = rng.uniform(0.85, 1.2)
            c, sn = s * np.cos(ang), s * np.sin(ang)
            M = np.array([[c, sn, rng.uniform(-15, 5)],
                          [-sn, c, rng.uniform(-5, 15)]], np.float32)
            a_img, a_mask = AD._warp_image(
                jnp.asarray(smooth, jnp.float32), jnp.asarray(mask),
                jnp.asarray(M), 80, 96)
            b_img, b_mask = AD._warp_batch_sep(
                jnp.asarray(smooth[None]), jnp.asarray(mask[None]),
                jnp.asarray(M[None]), 80, 96, s_max=1.6)
            diff = np.abs(np.asarray(a_img) - np.asarray(b_img[0]))
            assert np.percentile(diff, 99) < 3.0, np.percentile(diff, 99)
            assert (np.asarray(a_mask)
                    != np.asarray(b_mask[0])).mean() < 0.01

    def test_affine_inverse(self):
        M = jnp.asarray([[0.7, 0.3, 4.0], [-0.3, 0.7, -2.0]])
        Minv = AD._invert_affine(M)
        A = np.concatenate([np.asarray(M), [[0, 0, 1]]], 0)
        B = np.concatenate([np.asarray(Minv), [[0, 0, 1]]], 0)
        np.testing.assert_allclose(A @ B, np.eye(3), atol=1e-5)


class TestFullBatch:
    def test_shapes_overlap_and_hcoord_consistency(self):
        img, mask, hcoords = make_scene()
        b = 4
        imgs = jnp.asarray(np.stack([img] * b))
        masks = jnp.asarray(np.stack([mask] * b))
        hcs = jnp.asarray(np.stack([hcoords] * b))
        cfg = AugConfig(blur=False, jitter=False)
        out_h, out_w = 64, 96
        aug = jax.jit(lambda i, m, h, k: AD.augment_batch(
            i, m, h, k, (out_h, out_w), cfg, normalize=False))
        oi, om, oh = aug(imgs, masks, hcs, jax.random.PRNGKey(0))
        assert oi.shape == (b, out_h, out_w, 3)
        assert om.shape == (b, out_h, out_w)
        assert oh.shape == (b, 3, 3)
        # the instance survives the crop with >= overlap_ratio of its area
        # (up to warp resampling): require a substantial remnant
        orig_area = mask.sum()
        for bi in range(b):
            vis = float(np.asarray(om[bi]).sum())
            # area scales with 1/ratio^2 in [1/1.44, 1/0.64]
            assert vis > 0.3 * orig_area
        # hcoords track the keypoint content: a keypoint inside the mask
        # must land inside the warped mask (when visible)
        om_np = np.asarray(om)
        for bi in range(b):
            x, y, _ = np.asarray(oh[bi][2])  # center keypoint
            xi, yi = int(round(x)), int(round(y))
            if 1 <= xi < out_w - 1 and 1 <= yi < out_h - 1:
                assert om_np[bi, yi - 1:yi + 2, xi - 1:xi + 2].any()

    def test_flip_transforms_hcoords(self):
        img, mask, hcoords = make_scene()
        cfg = AugConfig(rotation=False, crop=False, blur=False,
                        jitter=False, flip=True)
        h, w = mask.shape
        # run with many keys; flipped cases must mirror x
        oi, om, oh = jax.jit(lambda i, m, hc, k: AD.augment_batch(
            i, m, hc, k, (h, w), cfg, normalize=False))(
            jnp.asarray(img[None]).repeat(8, 0),
            jnp.asarray(mask[None]).repeat(8, 0),
            jnp.asarray(hcoords[None]).repeat(8, 0),
            jax.random.PRNGKey(1))
        oi, oh = np.asarray(oi), np.asarray(oh)
        flipped = np.abs(oi[:, :, ::-1] - img[None]).max(axis=(1, 2, 3)) < 1e-4
        kept = np.abs(oi - img[None]).max(axis=(1, 2, 3)) < 1e-4
        assert flipped.any() and kept.any()
        for bi in range(8):
            exp = w - hcoords[:, 0] if flipped[bi] else hcoords[:, 0]
            np.testing.assert_allclose(oh[bi][:, 0], exp, atol=1e-4)


class TestPhotometric:
    def test_blur_bank_normalized(self):
        bank = np.asarray(AD._gauss_weights_bank())
        np.testing.assert_allclose(bank.sum(1), 1.0, atol=1e-6)

    def test_blur_matches_cv2(self):
        import cv2
        img, _, _ = make_scene()
        for i, k in enumerate(AD._BLUR_SIZES):
            ref = cv2.GaussianBlur(img, (k, k), 0)
            wts = AD._gauss_weights_bank()[i][None]
            got = np.asarray(AD._separable_blur(jnp.asarray(img[None]),
                                                wts))[0]
            interior = (slice(8, -8), slice(8, -8))
            np.testing.assert_allclose(got[interior], ref[interior],
                                       rtol=1e-3, atol=0.5)

    def test_color_jitter_jit_matches_eager(self):
        """Regression: _rgb_to_hsv used to branch on ``mx == r``; XLA's
        fusion duplication recomputes r/g/b with different fma rounding,
        so a recomputed mx could equal NO channel and hue fell through to
        a garbage sector (~170-level pixel errors, fusion-dependent). The
        fixed sector selection compares channels directly, making jit and
        eager agree to rounding error on real-valued inputs."""
        import cv2
        img, _, _ = make_scene()
        smooth = cv2.GaussianBlur(img, (5, 5), 2)  # many exact channel ties
        batch = jnp.asarray(np.stack([img, smooth]), jnp.float32)
        cfg = AugConfig()
        key = jax.random.PRNGKey(11)
        eager = AD._color_jitter(batch, key, cfg)
        jitted = jax.jit(lambda x: AD._color_jitter(x, key, cfg))(batch)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                                   atol=1e-2)
        # channel-major form agrees with NHWC under jit too
        cm = jax.jit(lambda x: AD._color_jitter(x, key, cfg, ch_axis=1))(
            jnp.transpose(batch, (0, 3, 1, 2)))
        np.testing.assert_allclose(np.asarray(jnp.transpose(cm, (0, 2, 3, 1))),
                                   np.asarray(eager), atol=1e-2)

    def test_hsv_roundtrip(self):
        rng = np.random.RandomState(0)
        rgb = jnp.asarray(rng.rand(32, 32, 3).astype(np.float32))
        h, s, v = AD._rgb_to_hsv(rgb)
        back = np.asarray(AD._hsv_to_rgb(h, s, v))
        np.testing.assert_allclose(back, np.asarray(rgb), atol=1e-5)

    def test_jitter_identity_when_zero(self):
        img, mask, hcoords = make_scene()
        cfg = AugConfig(rotation=False, crop=False, blur=False, flip=False,
                        jitter=True, brightness=0, contrast=0,
                        saturation=0, hue=0)
        h, w = mask.shape
        oi, _, _ = AD.augment_batch(
            jnp.asarray(img[None]), jnp.asarray(mask[None]),
            jnp.asarray(hcoords[None]), jax.random.PRNGKey(0), (h, w), cfg,
            normalize=False)
        np.testing.assert_allclose(np.asarray(oi[0]), img, atol=1e-3)

    def test_jitter_matches_host_stats(self):
        """Device jitter with the recipe amounts stays near the host
        jitter's output distribution (mean shift bounded)."""
        from pvnet_tpu.data.augment import color_jitter
        img, _, _ = make_scene()
        cfg = AugConfig(rotation=False, crop=False, blur=False, flip=False)
        rng = np.random.RandomState(0)
        host = np.stack([
            color_jitter(img.astype(np.uint8), cfg.brightness, cfg.contrast,
                         cfg.saturation, cfg.hue, rng).astype(np.float32)
            for _ in range(16)])
        oi, _, _ = AD.augment_batch(
            jnp.asarray(img[None]).repeat(16, 0),
            jnp.asarray(np.zeros(img.shape[:2], np.int32)[None]).repeat(16, 0),
            jnp.asarray(np.zeros((16, 1, 3), np.float32)),
            jax.random.PRNGKey(3), img.shape[:2], cfg, normalize=False)
        dev = np.asarray(oi)
        assert abs(host.mean() - dev.mean()) < 6.0
        assert abs(host.std() - dev.std()) < 6.0


class TestTrainStepIntegration:
    def _raw_batch(self, b=2, h=48, w=64, k=9):
        rng = np.random.RandomState(0)
        image = rng.randint(0, 255, (b, h, w, 3)).astype(np.float32)
        mask = np.zeros((b, h, w), np.int32)
        mask[:, 12:36, 16:48] = 1
        hcoords = rng.uniform(16, 48, (b, k, 3)).astype(np.float32)
        hcoords[..., 2] = 1.0
        return {
            "image": jnp.asarray(image),
            "mask": jnp.asarray(mask),
            "hcoords": jnp.asarray(hcoords),
            "vertex_weights": jnp.asarray(
                (mask > 0)[..., None].astype(np.float32)),
            "ignore": jnp.zeros((b,), jnp.float32),
        }

    def test_single_device_step_with_aug(self):
        from pvnet_tpu.config import TrainConfig
        from pvnet_tpu.models.pvnet import build_model
        from pvnet_tpu.train import trainer as trainer_mod
        cfg = TrainConfig()
        model = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
        state = trainer_mod.create_train_state(model, cfg, (1, 32, 32, 3),
                                               jax.random.PRNGKey(0))
        batch = self._raw_batch()
        import functools
        step = jax.jit(functools.partial(
            trainer_mod.train_step, aug_cfg=cfg.aug_cfg, aug_hw=(32, 32)))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(1))
        assert np.isfinite(float(metrics["loss"]))
        assert int(new_state.step) == int(state.step) + 1

    def test_sharded_step_with_aug(self):
        from pvnet_tpu.config import TrainConfig
        from pvnet_tpu.models.pvnet import build_model
        from pvnet_tpu.parallel import make_mesh, replicate, shard_batch
        from pvnet_tpu.train import trainer as trainer_mod
        cfg = TrainConfig()
        mesh = make_mesh()
        n = mesh.devices.size
        model = build_model("resnet18_8s", ver_dim=18, seg_dim=2)
        state = trainer_mod.create_train_state(model, cfg, (1, 32, 32, 3),
                                               jax.random.PRNGKey(0))
        state = replicate(state, mesh)
        batch = shard_batch(self._raw_batch(b=n), mesh)
        step = trainer_mod.make_sharded_train_step(
            mesh, donate=False, aug_cfg=cfg.aug_cfg, aug_hw=(32, 32))
        new_state, metrics = step(state, batch, jax.random.PRNGKey(2))
        assert np.isfinite(float(metrics["loss"]))
