"""Unit tests for schedules and diffusion math against closed forms and
independently reproduced reference numerics."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advshadow_tpu.core import (
    make_beta_schedule,
    make_diffusion,
    predict_x0_from_noise,
    q_posterior,
    q_sample,
    sample_timesteps,
)


class TestSchedules:
    def test_linear_scaled(self):
        b = make_beta_schedule("linear", 1000)
        assert b.dtype == np.float64
        assert b[0] == pytest.approx(1e-4)
        assert b[-1] == pytest.approx(0.02)
        # scale = 1000/T
        b500 = make_beta_schedule("linear", 500)
        assert b500[0] == pytest.approx(2e-4)
        assert b500[-1] == pytest.approx(0.04)

    def test_cosine_matches_closed_form(self):
        T = 100
        b = make_beta_schedule("cosine", T)
        s = 0.008
        f = lambda x: math.cos((x / T + s) / (1 + s) * math.pi / 2) ** 2
        # beta_t = 1 - abar(t+1)/abar(t) with abar normalized by f(0)
        expected = 1 - f(1) / f(0)
        assert b[0] == pytest.approx(expected, rel=1e-12)
        assert np.all(b <= 0.999) and np.all(b > 0)

    def test_framework_linear(self):
        b = make_beta_schedule("framework_linear", 1000)
        assert b[0] == pytest.approx(1e-4) and b[-1] == pytest.approx(2e-2)

    def test_framework_cosine(self):
        T = 1000
        b = make_beta_schedule("framework_cosine", T)
        ah = lambda t: math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2
        assert b[3] == pytest.approx(1 - ah(4 / T) / ah(3 / T), rel=1e-12)
        assert np.all(b <= 0.999)

    def test_sqrt_variants(self):
        b1 = make_beta_schedule("sqrt_linear", 10)
        assert b1[0] == pytest.approx(1e-4) and b1[-1] == pytest.approx(2e-2)
        b2 = make_beta_schedule("sqrt", 10)
        assert b2[0] == pytest.approx(1e-2) and b2[-1] == pytest.approx(0.02**0.5)

    def test_unknown_raises(self):
        with pytest.raises(ValueError):
            make_beta_schedule("nope", 10)


class TestDiffusion:
    def setup_method(self):
        self.coeffs = make_diffusion(timesteps=50, beta_schedule="cosine")

    def test_coefficient_identities(self):
        c = self.coeffs
        np.testing.assert_allclose(c.alphas, 1.0 - c.betas, rtol=1e-4)
        np.testing.assert_allclose(
            c.sqrt_alphas_cumprod**2 + c.sqrt_one_minus_alphas_cumprod**2,
            1.0, rtol=1e-5,
        )
        # posterior log-variance at t=0 equals variance[1] (reference quirk,
        # ref: diff_model.py:320-322)
        np.testing.assert_allclose(
            c.posterior_log_variance_clipped[0],
            jnp.log(c.posterior_variance[1]), rtol=1e-4,
        )

    def test_q_sample_roundtrip(self):
        """predict_x0_from_noise inverts q_sample exactly."""
        rng = jax.random.PRNGKey(0)
        x0 = jax.random.uniform(rng, (2, 8, 8, 3), minval=-1, maxval=1)
        noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
        t = jnp.array([3, 40])
        xt = q_sample(self.coeffs, x0, t, noise)
        x0_rec = predict_x0_from_noise(self.coeffs, xt, t, noise)
        np.testing.assert_allclose(x0_rec, x0, atol=1e-4)

    def test_posterior_mean_at_x0_equals_weighted(self):
        c = self.coeffs
        x0 = jnp.ones((1, 4, 4, 3))
        xt = jnp.full((1, 4, 4, 3), 0.5)
        t = jnp.array([10])
        mean, var, logvar = q_posterior(c, x0, xt, t)
        expected = c.posterior_mean_coef1[10] * 1.0 + c.posterior_mean_coef2[10] * 0.5
        np.testing.assert_allclose(mean, expected, rtol=1e-5)
        np.testing.assert_allclose(var[0, 0, 0, 0], c.posterior_variance[10])

    def test_sample_timesteps_range(self):
        t = sample_timesteps(jax.random.PRNGKey(0), 512, 50, low=1)
        assert int(t.min()) >= 1 and int(t.max()) < 50

    def test_q_sample_variance_matches_schedule(self):
        """Statistical check: Var[x_t | x_0=0] == 1 - alpha_bar_t."""
        c = self.coeffs
        n = 20000
        noise = jax.random.normal(jax.random.PRNGKey(2), (n, 1, 1, 1))
        x0 = jnp.zeros((n, 1, 1, 1))
        t = jnp.full((n,), 25)
        xt = q_sample(c, x0, t, noise)
        emp = float(jnp.var(xt))
        assert emp == pytest.approx(float(1 - c.alphas_cumprod[25]), rel=0.05)
