"""Voting layer tests on synthetic vertex fields with known keypoints.

Fixture strategy mirrors the reference's own de-facto tests (its
ransac_voting_gpu.py __main__ block eyeballs voted vs GT corners): build a
mask + unit-vector field pointing exactly (or noisily) at known keypoints
and check the layer recovers them.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pvnet_tpu.ops import voting


def make_field(h, w, keypoints, mask_box, noise=0.0, rng=None,
               outlier_frac=0.0):
    """mask [h,w], vertex [h,w,vn,2] with unit vectors pixel->keypoint."""
    vn = keypoints.shape[0]
    mask = np.zeros((h, w), np.int32)
    y0, y1, x0, x1 = mask_box
    mask[y0:y1, x0:x1] = 1
    ys, xs = np.nonzero(mask)
    pix = np.stack([xs, ys], axis=-1).astype(np.float32)    # [t, 2]
    vec = keypoints[None, :, :] - pix[:, None, :]           # [t, vn, 2]
    norm = np.linalg.norm(vec, axis=-1, keepdims=True)
    norm[norm < 1e-3] += 1e-3
    vec = vec / norm
    if noise > 0:
        ang = rng.randn(*vec.shape[:-1]) * noise
        ca, sa = np.cos(ang), np.sin(ang)
        vec = np.stack([ca * vec[..., 0] - sa * vec[..., 1],
                        sa * vec[..., 0] + ca * vec[..., 1]], axis=-1)
    if outlier_frac > 0:
        bad = rng.rand(vec.shape[0]) < outlier_frac
        rand_dir = rng.randn(bad.sum(), vn, 2)
        rand_dir /= np.linalg.norm(rand_dir, axis=-1, keepdims=True)
        vec[bad] = rand_dir
    vertex = np.zeros((h, w, vn, 2), np.float32)
    vertex[ys, xs] = vec
    return mask, vertex


KPTS = np.array([[50.0, 30.0], [10.0, 90.0], [100.0, 70.0]], np.float32)
BOX = (40, 80, 30, 90)  # y0,y1,x0,x1


class TestSampleForeground:
    def test_shapes_and_counts(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        fg = voting.sample_foreground(jnp.asarray(mask)[None],
                                      jnp.asarray(vertex)[None], 512,
                                      jax.random.PRNGKey(0))
        assert fg.coords.shape == (1, 512, 2)
        assert fg.dirs.shape == (1, 512, 3, 2)
        n_fg = (BOX[1] - BOX[0]) * (BOX[3] - BOX[2])
        assert int(fg.total[0]) == n_fg
        assert int(fg.count[0]) == min(512, n_fg)
        # all valid coords must be inside the box
        c = np.asarray(fg.coords[0])[np.asarray(fg.valid[0])]
        assert (c[:, 0] >= BOX[2]).all() and (c[:, 0] < BOX[3]).all()
        assert (c[:, 1] >= BOX[0]).all() and (c[:, 1] < BOX[1]).all()

    def test_padding_dirs_zero(self):
        mask, vertex = make_field(64, 64, KPTS, (10, 14, 10, 14))
        fg = voting.sample_foreground(jnp.asarray(mask)[None],
                                      jnp.asarray(vertex)[None], 64,
                                      jax.random.PRNGKey(1))
        d = np.asarray(fg.dirs[0])
        v = np.asarray(fg.valid[0])
        assert int(fg.count[0]) == 16
        np.testing.assert_allclose(d[~v], 0.0)


class TestStratifiedSelection:
    """Phase-grid stratified sampler (the TPU-default selection path)."""

    def test_large_object_fills_budget(self):
        # box 40x60 covers every (y mod 16, x mod 32) phase of tn=512
        mask, vertex = make_field(128, 128, KPTS, BOX)
        fg = voting.sample_foreground(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None], 512,
            jax.random.PRNGKey(0), method="stratified")
        assert int(fg.count[0]) == 512
        assert int(fg.total[0]) == (BOX[1] - BOX[0]) * (BOX[3] - BOX[2])
        c = np.asarray(fg.coords[0])[np.asarray(fg.valid[0])]
        assert (c[:, 0] >= BOX[2]).all() and (c[:, 0] < BOX[3]).all()
        assert (c[:, 1] >= BOX[0]).all() and (c[:, 1] < BOX[1]).all()

    def test_small_object_keeps_every_phase(self):
        # 4x4 box, tn=64 -> phase grid 8x8: all 16 pixels distinct phases
        mask, vertex = make_field(64, 64, KPTS, (10, 14, 10, 14))
        fg = voting.sample_foreground(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None], 64,
            jax.random.PRNGKey(1), method="stratified")
        assert int(fg.count[0]) == 16
        d = np.asarray(fg.dirs[0])
        v = np.asarray(fg.valid[0])
        np.testing.assert_allclose(d[~v], 0.0)

    def test_dirs_match_field_at_coords(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        fg = voting.sample_foreground(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None], 256,
            jax.random.PRNGKey(2), method="stratified")
        v = np.asarray(fg.valid[0])
        c = np.asarray(fg.coords[0]).astype(int)
        d = np.asarray(fg.dirs[0])
        np.testing.assert_allclose(d[v], vertex[c[v, 1], c[v, 0]],
                                   rtol=1e-6)

    def test_nondivisible_image_padding(self):
        # 61x77 image with tn=64 (8x8 phases) exercises the pad path
        mask, vertex = make_field(61, 77, KPTS, (20, 50, 15, 70))
        fg = voting.sample_foreground(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None], 64,
            jax.random.PRNGKey(3), method="stratified")
        assert int(fg.count[0]) == 64
        c = np.asarray(fg.coords[0])[np.asarray(fg.valid[0])]
        assert (c[:, 0] < 77).all() and (c[:, 1] < 61).all()

    def test_selection_is_random_within_phase(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        fgs = [voting.sample_foreground(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None], 128,
            jax.random.PRNGKey(k), method="stratified") for k in (0, 1)]
        assert not np.allclose(np.asarray(fgs[0].coords),
                               np.asarray(fgs[1].coords))

    def test_v3_recovers_keypoints_with_stratified(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="xla",
            select_method="stratified")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)

    def test_v3_stratified_robust_to_outliers(self, rng):
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.01, rng=rng,
                                  outlier_frac=0.3)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=512, max_num=512, impl="xla",
            select_method="stratified")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=2.0)

    def test_valid_slots_form_contiguous_prefix(self):
        # pair sampling draws indices in [0, count): valid slots must be a
        # prefix even when the mask covers only a few phase buckets
        for box, tn in [((10, 14, 10, 14), 64), ((10, 13, 20, 27), 256),
                        (BOX, 512)]:
            mask, vertex = make_field(64, 64, KPTS, box)
            fg = voting.sample_foreground(
                jnp.asarray(mask)[None], jnp.asarray(vertex)[None], tn,
                jax.random.PRNGKey(5), method="stratified")
            v = np.asarray(fg.valid[0])
            cnt = int(fg.count[0])
            assert v[:cnt].all() and not v[cnt:].any(), (box, tn)

    def test_v3_small_object_sub_phase_grid(self):
        # 4x4 object with tn=64 leaves 48 of 64 phase buckets empty; voting
        # must still recover keypoints (regression: scattered valid slots
        # made pair sampling draw degenerate zeros -> ~100 px error)
        kpts = np.array([[20.0, 8.0], [5.0, 30.0], [40.0, 40.0]], np.float32)
        mask, vertex = make_field(64, 64, kpts, (10, 14, 10, 14))
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=64, impl="xla",
            select_method="stratified")
        np.testing.assert_allclose(np.asarray(pts[0]), kpts, atol=0.5)


class TestCountParity:
    def _random_inputs(self, rng, b=2, tn=96, vn=3, hn=160):
        coords = rng.uniform(0, 100, (b, tn, 2)).astype(np.float32)
        dirs = rng.randn(b, tn, vn, 2).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        valid = rng.rand(b, tn) < 0.8
        dirs = dirs * valid[..., None, None]
        count = valid.sum(1).astype(np.int32)
        fg = voting.ForegroundSample(
            jnp.asarray(coords), jnp.asarray(dirs), jnp.asarray(valid),
            jnp.asarray(count), jnp.asarray(count))
        hyps = rng.uniform(-20, 120, (b, hn, vn, 2)).astype(np.float32)
        return fg, jnp.asarray(hyps)

    def _brute_force(self, fg, hyps, thresh):
        """Direct transcription of the CUDA voting kernel semantics."""
        coords = np.asarray(fg.coords)
        dirs = np.asarray(fg.dirs)
        hy = np.asarray(hyps)
        b, hn, vn, _ = hy.shape
        tn = coords.shape[1]
        counts = np.zeros((b, hn, vn), np.int32)
        for bi in range(b):
            for hi in range(hn):
                for vi in range(vn):
                    h = hy[bi, hi, vi]
                    for ti in range(tn):
                        n = dirs[bi, ti, vi]
                        d = h - coords[bi, ti]
                        n1 = np.sqrt((n ** 2).sum())
                        n2 = np.sqrt((d ** 2).sum())
                        if n1 < 1e-6 or n2 < 1e-6:
                            continue
                        if (d @ n) / (n1 * n2) > thresh:
                            counts[bi, hi, vi] += 1
        return counts

    def test_xla_matches_bruteforce(self, rng):
        fg, hyps = self._random_inputs(rng, b=1, tn=40, vn=2, hn=24)
        got = np.asarray(voting.count_inliers_xla(fg, hyps, 0.9))
        expect = self._brute_force(fg, hyps, 0.9)
        np.testing.assert_array_equal(got, expect)

    def test_pallas_interpret_matches_xla(self, rng):
        fg, hyps = self._random_inputs(rng)
        ref = np.asarray(voting.count_inliers_xla(fg, hyps, 0.99))
        got = np.asarray(voting.count_inliers_pallas(
            fg, hyps, 0.99, tile_h=128, tile_t=32, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_pallas_interpret_nondivisible_tiles(self, rng):
        fg, hyps = self._random_inputs(rng, tn=100, hn=130)
        ref = np.asarray(voting.count_inliers_xla(fg, hyps, 0.95))
        got = np.asarray(voting.count_inliers_pallas(
            fg, hyps, 0.95, tile_h=128, tile_t=32, interpret=True))
        np.testing.assert_array_equal(got, ref)

    def test_bf16_counts_track_f32(self, rng):
        """bf16 counting dithers pixels near the cosine boundary but must
        track the f32 counts closely (winner selection is all it feeds)."""
        fg, hyps = self._random_inputs(rng, b=2, tn=256, vn=3, hn=64)
        ref = np.asarray(voting.count_inliers_xla(fg, hyps, 0.99))
        got = np.asarray(voting.count_inliers_xla_bf16(fg, hyps, 0.99))
        diff = np.abs(got - ref)
        # per-hypothesis deviation bounded by boundary dither, not bias
        assert diff.max() <= max(3, int(0.05 * 256)), diff.max()
        assert abs(float((got - ref).mean())) < 1.0


class TestVotingV3:
    def test_recovers_exact_keypoints(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)

    def test_robust_to_outliers(self, rng):
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.01, rng=rng,
                                  outlier_frac=0.3)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=512, max_num=512, impl="xla")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=2.0)

    def test_empty_mask_outputs_zero(self):
        mask = np.zeros((64, 64), np.int32)
        vertex = np.zeros((64, 64, 3, 2), np.float32)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=64, max_num=64, impl="xla")
        np.testing.assert_allclose(np.asarray(pts), 0.0)

    def test_bf16_impl_recovers_keypoints(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="bf16")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)

    def test_bf16_impl_robust_to_outliers(self, rng):
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.01, rng=rng,
                                  outlier_frac=0.3)
        pts = voting.ransac_voting_v3(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=512, max_num=512, impl="bf16")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=2.0)

    def test_batch_mixed(self, rng):
        mask1, vertex1 = make_field(96, 96, KPTS, (30, 60, 20, 70))
        mask0 = np.zeros_like(mask1)
        vertex0 = np.zeros_like(vertex1)
        masks = jnp.asarray(np.stack([mask0, mask1]))
        verts = jnp.asarray(np.stack([vertex0, vertex1]))
        pts = voting.ransac_voting_v3(masks, verts, jax.random.PRNGKey(3),
                                      hyp_num=256, max_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(pts[0]), 0.0)
        np.testing.assert_allclose(np.asarray(pts[1]), KPTS, atol=0.5)

    def test_jit_compiles(self):
        mask, vertex = make_field(64, 64, KPTS, (20, 40, 20, 40))
        f = jax.jit(lambda m, v, k: voting.ransac_voting_v3(
            m, v, k, hyp_num=128, max_num=128, impl="xla"))
        pts = f(jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
                jax.random.PRNGKey(0))
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=1.0)


class TestV2Refinement:
    def test_v2_recovers_keypoints(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        pts = voting.ransac_voting_v2(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)

    def test_v2_matches_v3_on_noisy_field(self, rng):
        # justifies v3 (single WLS refine) as the production default: the
        # reference's iterative re-vote + refit (refine_iter_num rounds)
        # lands within sub-pixel agreement of the one-pass refine
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.03, rng=rng,
                                  outlier_frac=0.2)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        pts_v3 = voting.ransac_voting_v3(
            m, v, jax.random.PRNGKey(0), hyp_num=512, max_num=512,
            inlier_thresh=0.99, impl="xla")
        pts_v2 = voting.ransac_voting_v2(
            m, v, jax.random.PRNGKey(0), hyp_num=512, max_num=512,
            inlier_thresh=0.99, refine_iter_num=3, impl="xla")
        err_v3 = np.abs(np.asarray(pts_v3[0]) - KPTS).max()
        err_v2 = np.abs(np.asarray(pts_v2[0]) - KPTS).max()
        assert err_v3 < 1.5 and err_v2 < 1.5
        # same winner, same basin: the iterated fit moves the answer < 1 px
        np.testing.assert_allclose(np.asarray(pts_v2), np.asarray(pts_v3),
                                   atol=1.0)

    def test_v2_one_iter_equals_v3(self):
        # refine_iter_num=1 is exactly v3's vote + single WLS fit
        mask, vertex = make_field(96, 96, KPTS, (30, 60, 20, 70))
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        pts_v2 = voting.ransac_voting_v2(
            m, v, jax.random.PRNGKey(7), hyp_num=128, max_num=128,
            inlier_thresh=0.99, refine_iter_num=1, impl="xla")
        pts_v3 = voting.ransac_voting_v3(
            m, v, jax.random.PRNGKey(7), hyp_num=128, max_num=128,
            inlier_thresh=0.99, impl="xla")
        np.testing.assert_allclose(np.asarray(pts_v2), np.asarray(pts_v3),
                                   rtol=1e-6, atol=1e-5)

    def test_v2_multiclass_dispatch(self, rng):
        mask1, vertex1 = make_field(96, 96, KPTS, (30, 60, 20, 70))
        pts = voting.ransac_voting_multiclass(
            jnp.asarray(mask1)[None], jnp.asarray(vertex1)[None],
            jax.random.PRNGKey(1), class_num=2, hyp_num=256, max_num=256,
            refine_iter_num=2, impl="xla")
        assert pts.shape == (1, 1, 3, 2)
        np.testing.assert_allclose(np.asarray(pts[0, 0]), KPTS, atol=0.5)

    def test_v2_empty_mask_zeros(self):
        mask = np.zeros((48, 48), np.int32)
        vertex = np.zeros((48, 48, 3, 2), np.float32)
        pts = voting.ransac_voting_v2(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=64, max_num=64, impl="xla")
        np.testing.assert_allclose(np.asarray(pts), 0.0)


class TestDistributionNoMean:
    def test_mean_matches_keypoints_cov_psd(self, rng):
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.03, rng=rng)
        mean, cov = voting.estimate_voting_distribution(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), min_hyp_num=1024, topk=128,
            max_num=512, impl="xla")
        np.testing.assert_allclose(np.asarray(mean[0]), KPTS, atol=1.0)
        c = np.asarray(cov[0])
        np.testing.assert_allclose(c, c.transpose(0, 2, 1), atol=1e-5)
        assert (np.linalg.eigvalsh(c) > -1e-5).all()

    def test_topk_weighting_tightens_cov(self, rng):
        # keeping only the best 128 of >=1024 hypotheses must not widen the
        # distribution vs keeping everything
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.05, rng=rng)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        _, cov_k = voting.estimate_voting_distribution(
            m, v, jax.random.PRNGKey(0), min_hyp_num=1024, topk=64,
            max_num=512, impl="xla")
        _, cov_all = voting.estimate_voting_distribution(
            m, v, jax.random.PRNGKey(0), min_hyp_num=1024, topk=1024,
            max_num=512, impl="xla")
        tr_k = np.trace(np.asarray(cov_k[0]), axis1=1, axis2=2)
        tr_all = np.trace(np.asarray(cov_all[0]), axis1=1, axis2=2)
        assert (tr_k <= tr_all + 1e-6).all()

    def test_empty_mask_zeros(self):
        mask = np.zeros((48, 48), np.int32)
        vertex = np.zeros((48, 48, 3, 2), np.float32)
        mean, cov = voting.estimate_voting_distribution(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), min_hyp_num=256, max_num=64, impl="xla")
        np.testing.assert_allclose(np.asarray(mean), 0.0)
        np.testing.assert_allclose(np.asarray(cov), 0.0)

    def test_agrees_with_given_mean_variant(self, rng):
        # the no-mean estimator's mean feeds the same covariance machinery
        # as estimate_voting_distribution_with_mean: covs must agree in scale
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.05, rng=rng)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        mean, cov_nm = voting.estimate_voting_distribution(
            m, v, jax.random.PRNGKey(0), min_hyp_num=1024, max_num=512,
            impl="xla")
        _, cov_wm = voting.estimate_voting_distribution_with_mean(
            m, v, mean, jax.random.PRNGKey(1), hyp_num=1024, max_num=512,
            impl="xla")
        tr_nm = np.trace(np.asarray(cov_nm[0]), axis1=1, axis2=2)
        tr_wm = np.trace(np.asarray(cov_wm[0]), axis1=1, axis2=2)
        ratio = tr_nm / np.maximum(tr_wm, 1e-12)
        # different weighting rules (top-k vs max-0.1 cut): same order
        assert (ratio > 0.05).all() and (ratio < 20.0).all()


class TestVotingV5:
    def test_confidence_high_for_clean_field(self):
        mask, vertex = make_field(128, 128, KPTS, BOX)
        pts, conf = voting.ransac_voting_v5(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="xla")
        np.testing.assert_allclose(np.asarray(pts[0]), KPTS, atol=0.5)
        assert (np.asarray(conf[0]) > 0.9).all()

    def test_confidence_lower_for_noisy_field(self, rng):
        mask, vertex = make_field(128, 128, KPTS, BOX, noise=0.15, rng=rng)
        _, conf_noisy = voting.ransac_voting_v5(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="xla")
        mask_c, vertex_c = make_field(128, 128, KPTS, BOX)
        _, conf_clean = voting.ransac_voting_v5(
            jnp.asarray(mask_c)[None], jnp.asarray(vertex_c)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256, impl="xla")
        assert np.asarray(conf_noisy).mean() < np.asarray(conf_clean).mean()


class TestDistribution:
    def test_cov_scales_with_noise(self, rng):
        key = jax.random.PRNGKey(0)
        covs = []
        for noise in (0.01, 0.1):
            mask, vertex = make_field(128, 128, KPTS, BOX, noise=noise,
                                      rng=rng)
            m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
            mean = voting.ransac_voting_v3(m, v, key, hyp_num=256,
                                           max_num=512, impl="xla")
            _, cov = voting.estimate_voting_distribution_with_mean(
                m, v, mean, key, hyp_num=512, max_num=512, impl="xla")
            covs.append(np.trace(np.asarray(cov[0]), axis1=-2, axis2=-1))
        assert covs[1].mean() > covs[0].mean()

    def test_cov_symmetric_psd(self, rng):
        mask, vertex = make_field(96, 96, KPTS, (30, 60, 20, 70),
                                  noise=0.05, rng=rng)
        m, v = jnp.asarray(mask)[None], jnp.asarray(vertex)[None]
        key = jax.random.PRNGKey(1)
        mean = voting.ransac_voting_v3(m, v, key, hyp_num=256, max_num=256,
                                       impl="xla")
        _, cov = voting.estimate_voting_distribution_with_mean(
            m, v, mean, key, hyp_num=512, max_num=256, impl="xla")
        cov = np.asarray(cov[0])
        np.testing.assert_allclose(cov, np.transpose(cov, (0, 2, 1)),
                                   atol=1e-4)
        eig = np.linalg.eigvalsh(cov)
        assert (eig > -1e-3).all()


class TestMotionVoting:
    def test_mean_of_offsets(self):
        h = w = 32
        mask = np.zeros((h, w), np.int32)
        mask[8:16, 8:16] = 1
        target = np.array([[20.0, 22.0]], np.float32)
        ys, xs = np.nonzero(mask)
        vertex = np.zeros((h, w, 1, 2), np.float32)
        vertex[ys, xs, 0] = target[0] - np.stack([xs, ys], -1)
        pts = voting.ransac_motion_voting(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), max_num=256)
        np.testing.assert_allclose(np.asarray(pts[0]), target, atol=1e-3)


class TestVotingV4:
    def test_variance_reflects_noise(self, rng):
        import pvnet_tpu.ops.voting as voting
        clean = make_field(96, 96, KPTS, (30, 60, 20, 70))
        noisy = make_field(96, 96, KPTS, (30, 60, 20, 70), noise=0.05,
                           rng=rng)
        import jax
        key = jax.random.PRNGKey(0)
        _, var_clean = voting.ransac_voting_v4(
            jnp.asarray(clean[0])[None], jnp.asarray(clean[1])[None], key,
            hyp_num=256, max_num=256, impl="xla")
        _, var_noisy = voting.ransac_voting_v4(
            jnp.asarray(noisy[0])[None], jnp.asarray(noisy[1])[None], key,
            hyp_num=256, max_num=256, impl="xla")
        assert np.asarray(var_noisy).mean() > np.asarray(var_clean).mean()

    def test_empty_mask_var_one(self):
        import pvnet_tpu.ops.voting as voting
        import jax
        mask = jnp.zeros((1, 32, 32), jnp.int32)
        vertex = jnp.zeros((1, 32, 32, 2, 2), jnp.float32)
        pts, var = voting.ransac_voting_v4(mask, vertex,
                                           jax.random.PRNGKey(0),
                                           hyp_num=64, max_num=64,
                                           impl="xla")
        np.testing.assert_allclose(np.asarray(pts), 0.0)
        np.testing.assert_allclose(np.asarray(var), 1.0)


class TestMulticlass:
    def test_two_classes_recovered(self, rng):
        import pvnet_tpu.ops.voting as voting
        import jax
        # class 1 in the left half, class 2 in the right half, each with
        # its own keypoint set
        kpts1 = np.array([[20.0, 30.0], [40.0, 60.0]], np.float32)
        kpts2 = np.array([[90.0, 30.0], [110.0, 60.0]], np.float32)
        m1, v1 = make_field(96, 128, kpts1, (20, 70, 10, 50))
        m2, v2 = make_field(96, 128, kpts2, (20, 70, 80, 120))
        mask = m1 + m2 * 2
        vertex = v1 + v2
        pts = voting.ransac_voting_multiclass(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), class_num=3, hyp_num=256, max_num=256,
            impl="xla")
        assert pts.shape == (1, 2, 2, 2)
        np.testing.assert_allclose(np.asarray(pts[0, 0]), kpts1, atol=1.0)
        np.testing.assert_allclose(np.asarray(pts[0, 1]), kpts2, atol=1.0)


class TestHypothesisViz:
    def test_counts_peak_near_keypoints(self):
        import pvnet_tpu.ops.voting as voting
        import jax
        mask, vertex = make_field(96, 96, KPTS, (30, 60, 20, 70))
        hyps, counts = voting.generate_hypotheses_with_counts(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=128, max_num=256, impl="xla")
        assert hyps.shape == (1, 128, 3, 2)
        assert counts.shape == (1, 128, 3)
        # best-counted hypothesis per keypoint is near the true keypoint
        best = np.asarray(jnp.take_along_axis(
            hyps, jnp.argmax(counts, axis=1)[:, None, :, None],
            axis=1))[0, 0]
        np.testing.assert_allclose(best, KPTS, atol=2.0)


class TestVanishingPoint:
    def test_recovers_finite_intersection(self):
        """For a finite target point, the homogeneous VP voting must agree
        with the euclidean keypoint (x/z, y/z)."""
        import jax
        from pvnet_tpu.ops import voting
        mask, vertex = make_field(128, 128, KPTS, BOX)
        vp = voting.ransac_voting_vanish_point(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=256, max_num=256)
        vp = np.asarray(vp[0])
        pts = vp[:, :2] / vp[:, 2:]
        np.testing.assert_allclose(pts, KPTS, atol=1.0)

    def test_parallel_field_gives_point_at_infinity(self):
        """All pixels share one direction -> rays never intersect; the
        vanishing point must have |z| << |xy| (direction at infinity)."""
        import jax
        from pvnet_tpu.ops import voting
        h = w = 64
        mask = np.zeros((h, w), np.int32)
        mask[20:44, 20:44] = 1
        d = np.array([0.6, 0.8], np.float32)
        vertex = np.zeros((h, w, 1, 2), np.float32)
        vertex[mask == 1, 0] = d
        vp = voting.ransac_voting_vanish_point(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=128, max_num=256)
        vp = np.asarray(vp[0, 0])
        assert abs(vp[2]) < 0.05 * np.linalg.norm(vp[:2])
        # direction matches the field
        dir_norm = vp[:2] / np.linalg.norm(vp[:2])
        np.testing.assert_allclose(np.abs(dir_norm @ d), 1.0, atol=1e-2)

    def test_empty_mask_zeros(self):
        import jax
        from pvnet_tpu.ops import voting
        vp = voting.ransac_voting_vanish_point(
            jnp.zeros((1, 32, 32), jnp.int32),
            jnp.zeros((1, 32, 32, 2, 2), jnp.float32),
            jax.random.PRNGKey(0), hyp_num=64, max_num=64)
        np.testing.assert_allclose(np.asarray(vp), 0.0)


class TestDetectorModels:
    def test_detector_shapes(self, rng):
        import jax
        from pvnet_tpu.models.detector import Detector, DetectorV2
        x = jnp.asarray(rng.randn(1, 64, 64, 3).astype(np.float32))
        for cls in (Detector, DetectorV2):
            model = cls()
            v = model.init(jax.random.PRNGKey(0), x, train=False)
            out = model.apply(v, x, train=False)
            assert out.shape == (1, 8, 8, 1)
            assert out.dtype == jnp.float32


class TestCenterVoting:
    def test_recovers_center_and_instance_mask(self):
        center = np.array([[60.0, 55.0]], np.float32)
        mask, vertex = make_field(128, 128, center, BOX)
        c, inst, ratio = voting.ransac_voting_center(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None, :, :, 0],
            jax.random.PRNGKey(0), hyp_num=256, max_num=4096)
        np.testing.assert_allclose(np.asarray(c[0]), center[0], atol=0.5)
        assert float(ratio[0]) > 0.95
        inst = np.asarray(inst[0])
        # support mask lies inside the foreground and covers most of it
        assert inst[mask == 0].sum() == 0
        assert inst[mask == 1].mean() > 0.9

    def test_outliers_excluded_from_instance(self):
        rng = np.random.RandomState(3)
        center = np.array([[60.0, 55.0]], np.float32)
        mask, vertex = make_field(128, 128, center, BOX, rng=rng,
                                  outlier_frac=0.3)
        c, inst, ratio = voting.ransac_voting_center(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None, :, :, 0],
            jax.random.PRNGKey(1), hyp_num=512, max_num=4096)
        np.testing.assert_allclose(np.asarray(c[0]), center[0], atol=1.0)
        assert 0.5 < float(ratio[0]) < 0.9

    def test_min_num_skip(self):
        mask = np.zeros((64, 64), np.int32)
        mask[30:33, 30:33] = 1   # 9 px < min_num=100
        vertex = np.zeros((64, 64, 2), np.float32)
        vertex[..., 0] = 1.0
        c, inst, ratio = voting.ransac_voting_center(
            jnp.asarray(mask)[None], jnp.asarray(vertex)[None],
            jax.random.PRNGKey(0), hyp_num=64, max_num=256)
        np.testing.assert_allclose(np.asarray(c), 0.0)
        np.testing.assert_allclose(np.asarray(inst), 0.0)
        np.testing.assert_allclose(np.asarray(ratio), 0.0)
