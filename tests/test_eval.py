"""Evaluation metric tests: PSNR/SSIM closed forms, FID vs scipy sqrtm,
batched ASR, Grad-CAM sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.linalg

from advshadow_tpu.eval import (
    batch_psnr_ssim,
    compute_asr,
    fid_from_features,
    frechet_distance,
    grad_cam,
    make_resnet_cam_fn,
    psnr,
    show_cam_on_image,
    ssim,
)
from advshadow_tpu.eval.fid import activation_statistics
from advshadow_tpu.ops.sqrtm import sqrtm_newton_schulz, trace_sqrtm_product


class TestPSNR:
    def test_closed_form(self):
        a = jnp.zeros((8, 8, 3))
        b = jnp.full((8, 8, 3), 0.1)
        # PSNR = 10 log10(1 / 0.01) = 20
        assert float(psnr(a, b, 1.0)) == pytest.approx(20.0, abs=1e-4)

    def test_identical_is_inf(self):
        a = jnp.ones((4, 4, 3))
        assert float(psnr(a, a)) == float("inf")


class TestSSIM:
    def test_identical_images(self):
        x = jax.random.uniform(jax.random.PRNGKey(0), (32, 32, 3))
        assert float(ssim(x, x)) == pytest.approx(1.0, abs=1e-5)

    def test_uncorrelated_noise_low(self):
        a = jax.random.uniform(jax.random.PRNGKey(1), (32, 32, 3))
        b = jax.random.uniform(jax.random.PRNGKey(2), (32, 32, 3))
        assert float(ssim(a, b)) < 0.2

    def test_luminance_shift_closed_form(self):
        """For constant images x=c1, y=c2: variances are 0, so SSIM =
        (2 c1 c2 + C1)(C2)/((c1^2+c2^2+C1)(C2)) — the luminance term."""
        c1v, c2v = 0.3, 0.6
        a = jnp.full((16, 16, 1), c1v)
        b = jnp.full((16, 16, 1), c2v)
        C1 = 0.01**2
        expected = (2 * c1v * c2v + C1) / (c1v**2 + c2v**2 + C1)
        assert float(ssim(a, b, data_range=1.0)) == pytest.approx(
            expected, rel=1e-3)  # f32 roundoff in the zero-variance terms

    def test_batch_metrics(self):
        a = jax.random.uniform(jax.random.PRNGKey(0), (4, 16, 16, 3))
        noise = 0.05 * jax.random.normal(jax.random.PRNGKey(1), a.shape)
        b = jnp.clip(a + noise, 0, 1)
        s, p = batch_psnr_ssim(a, b)
        assert 0 < float(s) < 1 and 15 < float(p) < 40

    @pytest.mark.parametrize("win_size", [7, 11])
    def test_matches_skimage_algorithm(self, win_size):
        """Ground truth: skimage structural_similarity's exact
        gaussian_weights=True algorithm (sigma-1.5 truncate-3.5 Gaussian
        via scipy.ndimage with 'nearest' padding — an 11-tap kernel
        independent of win_size; win_size only sets cov_norm and the
        border crop), per channel then averaged."""
        from scipy.ndimage import gaussian_filter

        rng = np.random.default_rng(5)
        a = rng.random((35, 29, 3)).astype(np.float64)
        b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1)
        dr = a.max() - a.min()
        C1, C2 = (0.01 * dr) ** 2, (0.03 * dr) ** 2
        NP = win_size**2
        cov_norm = NP / (NP - 1)
        pad = (win_size - 1) // 2
        f = lambda im: gaussian_filter(im, 1.5, truncate=3.5,
                                       mode="nearest")
        vals = []
        for c in range(3):
            x, y = a[..., c], b[..., c]
            ux, uy = f(x), f(y)
            vx = cov_norm * (f(x * x) - ux * ux)
            vy = cov_norm * (f(y * y) - uy * uy)
            vxy = cov_norm * (f(x * y) - ux * uy)
            S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
                (ux**2 + uy**2 + C1) * (vx + vy + C2))
            vals.append(S[pad:-pad, pad:-pad].mean())
        expected = np.mean(vals)
        got = float(ssim(jnp.asarray(a), jnp.asarray(b), win_size, dr))
        assert got == pytest.approx(expected, abs=2e-5)


class TestFID:
    def test_sqrtm_matches_scipy(self):
        rng = np.random.default_rng(0)
        m = rng.random((16, 16)).astype(np.float32)
        a = m @ m.T + 0.1 * np.eye(16, dtype=np.float32)  # PSD
        ours = np.asarray(sqrtm_newton_schulz(jnp.asarray(a), 40))
        theirs = scipy.linalg.sqrtm(a).real
        np.testing.assert_allclose(ours, theirs, atol=1e-3)

    def test_trace_sqrtm_product_matches_scipy(self):
        rng = np.random.default_rng(1)
        a = rng.random((12, 12)).astype(np.float32)
        b = rng.random((12, 12)).astype(np.float32)
        s1 = a @ a.T + 0.1 * np.eye(12, dtype=np.float32)
        s2 = b @ b.T + 0.1 * np.eye(12, dtype=np.float32)
        ours = float(trace_sqrtm_product(jnp.asarray(s1), jnp.asarray(s2), 50))
        theirs = float(np.trace(scipy.linalg.sqrtm(s1 @ s2).real))
        assert ours == pytest.approx(theirs, rel=2e-3)

    def test_trace_sqrtm_near_singular_covariances(self):
        """Classifier-feature covariances are near-singular (low effective
        rank at high dim).  The round-2 trained-pipeline eval caught the
        old ridge-stabilized Newton-Schulz cross term inflating the trace
        by ~n*sqrt(ridge) on exactly this regime, clamping real FIDs to 0
        — this pins the spectral implementation against scipy f64."""
        rng = np.random.default_rng(7)
        d, k, n = 128, 6, 400  # 6 strong directions in 128 dims
        basis = rng.standard_normal((k, d))
        fa = rng.standard_normal((n, k)) @ basis \
            + 0.01 * rng.standard_normal((n, d))
        fb = rng.standard_normal((n, k)) @ (basis + 0.05) \
            + 0.01 * rng.standard_normal((n, d))
        s1 = np.cov(fa, rowvar=False).astype(np.float32)
        s2 = np.cov(fb, rowvar=False).astype(np.float32)
        ours = float(trace_sqrtm_product(jnp.asarray(s1), jnp.asarray(s2)))
        theirs = float(np.trace(scipy.linalg.sqrtm(
            s1.astype(np.float64) @ s2.astype(np.float64)).real))
        assert ours == pytest.approx(theirs, rel=1e-2)

    def test_identical_sets_zero(self):
        f = jax.random.normal(jax.random.PRNGKey(0), (256, 32))
        assert abs(float(fid_from_features(f, f))) < 0.5

    def test_mean_shift_analytic(self):
        """Same covariance, mean shift d: FID ~= ||d||^2."""
        f1 = jax.random.normal(jax.random.PRNGKey(0), (4096, 8))
        f2 = f1 + jnp.asarray([2.0] + [0.0] * 7)
        assert float(fid_from_features(f1, f2)) == pytest.approx(4.0, abs=0.3)

    def test_cov_stats_ddof1(self):
        f = np.random.default_rng(0).random((64, 5)).astype(np.float32)
        mu, sigma = activation_statistics(jnp.asarray(f))
        np.testing.assert_allclose(mu, f.mean(0), atol=1e-5)
        np.testing.assert_allclose(sigma, np.cov(f, rowvar=False), atol=1e-5)


class TestASR:
    def test_synthetic_victim(self):
        def victim(x):
            # predicts class = floor(mean * 3)
            m = jnp.clip((x.mean(axis=(1, 2, 3)) * 3).astype(jnp.int32), 0, 3)
            return jax.nn.one_hot(m, 4) * 10.0

        imgs = jnp.stack([jnp.full((8, 8, 3), v) for v in (0.1, 0.5, 0.9)])
        labels = jnp.array([0, 1, 0])  # last one mislabeled on purpose
        out = compute_asr(victim, imgs, labels)
        assert out["n"] == 3
        assert out["asr"] == pytest.approx(1 / 3)
        assert out["accuracy"] == pytest.approx(2 / 3)


class TestGradCAM:
    def test_resnet_cam_shape_and_range(self):
        from advshadow_tpu.victims import make_victim_model

        model = make_victim_model("resnet18", num_classes=4)
        x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = jax.jit(
            lambda r, x: model.init(r, x))(jax.random.PRNGKey(1), x)
        cam_fn = make_resnet_cam_fn(model, variables)
        cam = grad_cam(cam_fn, x)
        assert cam.shape == (2, 32, 32)
        assert float(cam.min()) >= 0 and float(cam.max()) <= 1 + 1e-6
        overlay = show_cam_on_image(x[0], cam[0])
        assert overlay.shape == (32, 32, 3)

    def test_cam_equals_fc_row_for_gap_head(self):
        """For a GAP+Dense head, d score/d features pooled == fc row /
        (h*w); the CAM weights must match that analytic value."""
        from advshadow_tpu.victims import make_victim_model

        model = make_victim_model("resnet18", num_classes=3)
        x = jax.random.uniform(jax.random.PRNGKey(0), (1, 32, 32, 3))
        variables = jax.jit(
            lambda r, x: model.init(r, x))(jax.random.PRNGKey(1), x)
        logits, feats = model.apply(variables, x, return_features=True)
        target = jnp.argmax(logits, axis=-1)

        def score(offset):
            lg, _ = model.apply(variables, x, return_features=True,
                                feature_offset=offset)
            return jnp.take_along_axis(lg, target[:, None], axis=-1).sum()

        g = jax.grad(score)(jnp.zeros_like(feats))
        got = g.mean(axis=(1, 2))[0]
        fc_w = variables["params"]["fc"]["kernel"]  # [C, classes]
        h, w = feats.shape[1], feats.shape[2]
        expected = fc_w[:, int(target[0])] / (h * w)
        np.testing.assert_allclose(got, expected, atol=1e-6)


class TestFIDSmallSample:
    def test_rank_deficient_covariances_finite(self):
        """Fewer samples than feature dims (rank-deficient covariances)
        must give a finite, non-negative FID — the naive Newton-Schulz on
        the nonsymmetric product NaN'd here (found running the example
        pipeline on a 16-image folder with 512-d features)."""
        f1 = jax.random.normal(jax.random.PRNGKey(0), (16, 512))
        f2 = jax.random.normal(jax.random.PRNGKey(1), (16, 512)) + 0.5
        out = float(fid_from_features(f1, f2))
        assert np.isfinite(out) and out > 0
        same = float(fid_from_features(f1, f1))
        assert same == 0.0


class TestHeatmapToy:
    def test_shift_and_blend(self):
        from advshadow_tpu.eval.gradcam import shift_and_blend_heatmap

        img = jnp.zeros((8, 8, 3))
        cam = jnp.zeros((8, 8)).at[0, 0].set(1.0)
        out = shift_and_blend_heatmap(img, cam, dx=2, dy=3)
        assert out.shape == (8, 8, 3)
        # the hot spot moved to (3, 2) and reads red-ish in jet
        assert float(out[3, 2, 0]) > float(out[0, 0, 0])
