"""Sampler tests: scan-vs-python-loop equivalence, closed-form recovery,
CFG fusion identity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from advshadow_tpu.core import make_diffusion
from advshadow_tpu.samplers import (
    ddim_sample,
    ddim_sample_framework,
    ddim_timestep_sequence,
    ddpm_sample,
    framework_time_pairs,
    make_denoise_fn,
    p_sample_loop,
    plms_sample,
)

T = 20
SHAPE = (2, 4, 4, 3)


def linear_denoiser(x, t):
    """Deterministic toy denoiser: eps depends on x and t."""
    return 0.1 * x + 0.01 * t.astype(jnp.float32).reshape(-1, 1, 1, 1)


def oracle_denoiser(coeffs, x_star):
    """Perfect eps-predictor for a point-mass data distribution at x_star:
    eps*(x_t, t) = (x_t - sqrt(abar_t) x_star) / sqrt(1 - abar_t)."""

    def fn(x, t):
        abar = coeffs.alphas_cumprod[t].reshape(-1, 1, 1, 1)
        return (x - jnp.sqrt(abar) * x_star) / jnp.sqrt(1 - abar)

    return fn


class TestTimestepSequences:
    def test_uniform_sequence(self):
        seq = ddim_timestep_sequence(1000, 50)
        assert len(seq) == 50
        assert seq[0] == 1 and seq[-1] == 981
        assert np.all(np.diff(seq) == 20)

    def test_quad_sequence(self):
        seq = ddim_timestep_sequence(1000, 10, "quad")
        assert seq[0] == 1 and np.all(np.diff(seq) > 0)

    def test_unknown_method(self):
        with pytest.raises(NotImplementedError):
            ddim_timestep_sequence(1000, 10, "bogus")

    def test_framework_pairs(self):
        pairs = framework_time_pairs(1000, 500)
        # first pair is (high, next lower), last pair ends at 0
        assert pairs[0, 0] == 999 and pairs[-1, 1] == 0
        assert pairs.shape == (500, 2)
        # consecutive: t_prev of row i == t of row i+1
        assert np.all(pairs[:-1, 1] == pairs[1:, 0])


class TestScanVsLoop:
    """The lax.scan samplers must match a straightforward python loop over
    the same update equations with the same RNG stream."""

    def setup_method(self):
        self.coeffs = make_diffusion(T, "framework_linear")
        self.rng = jax.random.PRNGKey(42)

    def test_ddpm_matches_loop(self):
        out = ddpm_sample(self.coeffs, linear_denoiser, self.rng, SHAPE)

        c = self.coeffs
        rng, init_rng = jax.random.split(self.rng)
        x = jax.random.normal(init_rng, SHAPE, dtype=jnp.float32)
        keys = jax.random.split(rng, T - 1)
        for idx, i in enumerate(range(T - 1, 0, -1)):
            t = jnp.full((SHAPE[0],), i, jnp.int32)
            eps = linear_denoiser(x, t)
            a, ah, b = c.alphas[i], c.alphas_cumprod[i], c.betas[i]
            noise = jax.random.normal(keys[idx], SHAPE) if i > 1 else jnp.zeros(SHAPE)
            x = 1 / jnp.sqrt(a) * (x - (1 - a) / jnp.sqrt(1 - ah) * eps) + jnp.sqrt(b) * noise
        np.testing.assert_allclose(out, x, atol=1e-4)

    def test_ddim_framework_matches_loop(self):
        out = ddim_sample_framework(
            self.coeffs, linear_denoiser, self.rng, SHAPE, sample_steps=10
        )
        c = self.coeffs
        rng, init_rng = jax.random.split(self.rng)
        x = jax.random.normal(init_rng, SHAPE, dtype=jnp.float32)
        pairs = framework_time_pairs(T, 10)
        for t, p in pairs:
            tb = jnp.full((SHAPE[0],), int(t), jnp.int32)
            at, ap = c.alphas_cumprod[int(t)], c.alphas_cumprod[int(p)]
            eps = linear_denoiser(x, tb)
            x0 = jnp.clip((x - eps * jnp.sqrt(1 - at)) / jnp.sqrt(at), -1, 1)
            x = jnp.sqrt(ap) * x0 + jnp.sqrt(1 - ap) * eps  # eta=0
        np.testing.assert_allclose(out, x, atol=1e-4)

    def test_plms_matches_loop(self):
        out = plms_sample(
            self.coeffs, linear_denoiser, self.rng, SHAPE, sample_steps=10
        )
        c = self.coeffs
        rng, init_rng = jax.random.split(self.rng)
        x = jax.random.normal(init_rng, SHAPE, dtype=jnp.float32)
        pairs = framework_time_pairs(T, 10)
        old_eps = []

        def upd(x, e, at, ap):
            x0 = jnp.clip((x - e * jnp.sqrt(1 - at)) / jnp.sqrt(at), -1, 1)
            return jnp.sqrt(ap) * x0 + jnp.sqrt(1 - ap) * e

        for t, p in pairs:
            tb = jnp.full((SHAPE[0],), int(t), jnp.int32)
            pb = jnp.full((SHAPE[0],), int(p), jnp.int32)
            at, ap = c.alphas_cumprod[int(t)], c.alphas_cumprod[int(p)]
            eps = linear_denoiser(x, tb)
            if len(old_eps) == 0:
                p_x = upd(x, eps, at, ap)
                eps_next = linear_denoiser(p_x, pb)
                ep = (eps + eps_next) / 2
            elif len(old_eps) == 1:
                ep = (3 * eps - old_eps[-1]) / 2
            elif len(old_eps) == 2:
                ep = (23 * eps - 16 * old_eps[-1] + 5 * old_eps[-2]) / 12
            else:
                ep = (55 * eps - 59 * old_eps[-1] + 37 * old_eps[-2] - 9 * old_eps[-3]) / 24
            x = upd(x, ep, at, ap)
            old_eps.append(eps)
        np.testing.assert_allclose(out, x, atol=1e-4)


class TestClosedForm:
    def test_ddim_oracle_recovers_point_mass(self):
        """With a perfect eps-oracle for a point mass, deterministic DDIM
        must land on x_star."""
        coeffs = make_diffusion(1000, "linear")
        x_star = jnp.full(SHAPE, 0.37)
        fn = oracle_denoiser(coeffs, x_star)
        out = ddim_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                          ddim_timesteps=50)
        np.testing.assert_allclose(out, x_star, atol=5e-2)

    def test_p_sample_loop_oracle(self):
        coeffs = make_diffusion(200, "linear")
        x_star = jnp.full(SHAPE, -0.25)
        fn = oracle_denoiser(coeffs, x_star)
        out = p_sample_loop(coeffs, fn, jax.random.PRNGKey(1), SHAPE)
        assert float(jnp.mean(jnp.abs(out - x_star))) < 0.15


class TestDPMSolverPP:
    def test_oracle_closed_form(self):
        """With a perfect point-mass x0-oracle the 2M update collapses to
        the exact linear recursion x_i - a_i x* = (s_i/s_{i-1})(x_{i-1} -
        a_{i-1} x*), so the output equals a_0 x* + (s_0/s_T) (x_init -
        a_T x*) in closed form (and ~x* since s_0/s_T ~ 1e-2)."""
        from advshadow_tpu.samplers import dpmpp2m_sample
        from advshadow_tpu.samplers.dpm import dpmpp2m_tables

        coeffs = make_diffusion(1000, "linear")
        x_star = jnp.full(SHAPE, 0.37)
        fn = oracle_denoiser(coeffs, x_star)
        x_init = jax.random.normal(jax.random.PRNGKey(3), SHAPE)
        out = dpmpp2m_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                             sample_steps=20, x_init=x_init,
                             clip_denoised=False)
        abar = np.asarray(coeffs.alphas_cumprod, np.float64)
        seq = ddim_timestep_sequence(1000, 20)
        aT, sT = np.sqrt(abar[seq[-1]]), np.sqrt(1 - abar[seq[-1]])
        a0, s0 = np.sqrt(abar[0]), np.sqrt(1 - abar[0])
        expected = a0 * np.asarray(x_star) + (s0 / sT) * (
            np.asarray(x_init) - aT * np.asarray(x_star))
        np.testing.assert_allclose(np.asarray(out), expected, atol=1e-4)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x_star),
                                   atol=5e-2)

    def test_second_order_beats_ddim_at_equal_steps(self):
        """On a smooth nonlinear denoiser (x0_pred = tanh(x)), 20-step
        DPM-Solver++(2M) must track the fine-step ODE solution closer
        than 20-step DDIM does (the whole point of the 2nd order)."""
        from advshadow_tpu.samplers import dpmpp2m_sample

        coeffs = make_diffusion(1000, "linear")

        def fn(x, t):
            abar = coeffs.alphas_cumprod[t].reshape(-1, 1, 1, 1)
            return (x - jnp.sqrt(abar) * jnp.tanh(x)) / jnp.sqrt(1 - abar)

        x_init = jax.random.normal(jax.random.PRNGKey(7), SHAPE)
        kw = dict(x_init=x_init, clip_denoised=False)
        truth = dpmpp2m_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                               sample_steps=400, **kw)
        fast = dpmpp2m_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                              sample_steps=20, **kw)
        ddim20 = ddim_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                             ddim_timesteps=20, **kw)
        err_fast = float(jnp.mean(jnp.abs(fast - truth)))
        err_ddim = float(jnp.mean(jnp.abs(ddim20 - truth)))
        assert err_fast < err_ddim / 2, (err_fast, err_ddim)
        assert err_fast < 3e-2  # measured ~0.022 at 20 steps

    def test_thresholded_form_matches_ddim_under_clipping(self):
        """The thresholded data-prediction form must clip the FULL x0
        contribution like the reference DDIM does (clip x0_hat, raw eps
        direction).  With a constant-x0 denoiser that overshoots the data
        range (x0_pred = 1.8 > 1), D_bar == x0 on every step, so the 2M
        chain must coincide with the DDIM chain on the same grid exactly
        — the pre-fix sigma-ratio form fails this by carrying the
        unclipped overshoot forward in (sigma_i/sigma_{i-1}) x_{i-1}."""
        from advshadow_tpu.samplers import dpmpp2m_sample

        coeffs = make_diffusion(1000, "linear")
        overshoot = 1.8

        def fn(x, t):
            abar = coeffs.alphas_cumprod[t].reshape(-1, 1, 1, 1)
            return (x - jnp.sqrt(abar) * overshoot) / jnp.sqrt(1 - abar)

        x_init = jax.random.normal(jax.random.PRNGKey(11), SHAPE)
        kw = dict(x_init=x_init, clip_denoised=True)
        fast = dpmpp2m_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                              sample_steps=20, **kw)
        ddim = ddim_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                           ddim_timesteps=20, **kw)
        np.testing.assert_allclose(np.asarray(fast), np.asarray(ddim),
                                   atol=1e-4)
        # and the clip really engaged: the final state is the clipped
        # target plus the (tiny) terminal eps direction, not 1.8
        assert float(jnp.max(fast)) < 1.2

    def test_registry_and_cfg_path(self):
        """'dpmpp' resolves from the registry and runs under the fused-CFG
        denoise closure (2N batch) without shape issues."""
        from advshadow_tpu.samplers import make_sampler

        coeffs = make_diffusion(100, "linear")
        calls = []

        def apply_fn(params, x, t, y=None):
            calls.append(x.shape[0])
            return 0.05 * x

        labels = jnp.zeros((SHAPE[0],), jnp.int32)
        denoise = make_denoise_fn(apply_fn, None, labels, 3.0)
        out = make_sampler("dpmpp")(coeffs, denoise, jax.random.PRNGKey(0),
                                    SHAPE, sample_steps=5)
        assert out.shape == SHAPE and np.isfinite(np.asarray(out)).all()
        assert set(calls) == {2 * SHAPE[0]}  # fused CFG forward each step


class TestCFG:
    def test_fused_cfg_equals_two_forwards(self):
        calls = []

        def apply_fn(params, x, t, y=None):
            calls.append(x.shape[0])
            base = 0.05 * x
            if y is None:
                return base
            shift = jnp.where(y < 0, 0.0, y.astype(jnp.float32))
            return base + shift.reshape(-1, 1, 1, 1)

        labels = jnp.array([1, 3])
        fn = make_denoise_fn(apply_fn, None, labels, cfg_scale=3.0)
        x = jnp.ones(SHAPE)
        t = jnp.array([5, 5])
        fused = fn(x, t)
        # reference: lerp(uncond, cond, s) = uncond + s*(cond - uncond)
        cond = apply_fn(None, x, t, labels)
        uncond = apply_fn(None, x, t, jnp.array([-1, -1]))
        np.testing.assert_allclose(fused, uncond + 3.0 * (cond - uncond), atol=1e-5)
        assert calls[0] == 4  # one fused 2N forward

    def test_no_cfg_single_forward(self):
        def apply_fn(params, x, t, y=None):
            return jnp.zeros_like(x) + (0 if y is None else 1)

        fn = make_denoise_fn(apply_fn, None, jnp.array([1, 2]), cfg_scale=None)
        assert float(fn(jnp.ones(SHAPE), jnp.array([1, 1]))[0, 0, 0, 0]) == 1.0
        fn_u = make_denoise_fn(apply_fn, None, None, None)
        assert float(fn_u(jnp.ones(SHAPE), jnp.array([1, 1]))[0, 0, 0, 0]) == 0.0


class TestReturnAll:
    def test_ddpm_trajectory(self):
        coeffs = make_diffusion(T, "framework_linear")
        traj = ddpm_sample(coeffs, linear_denoiser, jax.random.PRNGKey(0),
                           SHAPE, return_all=True)
        assert traj.shape == (T - 1, *SHAPE)
        # last frame equals the non-trajectory result
        final = ddpm_sample(coeffs, linear_denoiser, jax.random.PRNGKey(0),
                            SHAPE)
        np.testing.assert_allclose(traj[-1], final, atol=1e-5)

    def test_p_sample_loop_trajectory(self):
        coeffs = make_diffusion(T, "framework_linear")
        traj = p_sample_loop(coeffs, linear_denoiser, jax.random.PRNGKey(1),
                             SHAPE, return_all=True)
        assert traj.shape == (T, *SHAPE)


class TestDPMSolverPPSDE:
    def test_quad_grid_dedup_no_nan(self):
        """quad grids with sample_steps >= ~30 repeat small timesteps via
        the int cast; the tables must dedupe the boundary grid so h > 0
        everywhere and sampling stays finite (round-2 advisor finding)."""
        from advshadow_tpu.samplers import dpmpp2m_sample
        from advshadow_tpu.samplers.dpm import dpmpp2m_tables

        coeffs = make_diffusion(1000, "linear")
        tables = dpmpp2m_tables(np.asarray(coeffs.alphas_cumprod), 1000, 50,
                                method="quad")
        for tab in tables:
            assert np.isfinite(np.asarray(tab, np.float64)).all()
        ts = np.asarray(tables[0])
        assert np.all(np.diff(ts) < 0)  # strictly decreasing, no dupes
        x_star = jnp.full(SHAPE, 0.2)
        out = dpmpp2m_sample(coeffs, oracle_denoiser(coeffs, x_star),
                             jax.random.PRNGKey(0), SHAPE, sample_steps=50,
                             method="quad")
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(x_star),
                                   atol=6e-2)

    def test_logsnr_and_karras_grids(self):
        """The beyond-reference few-step grids: strictly decreasing
        boundaries spanning [~T-1, 0], uniform-in-lambda for logsnr
        (so c_i == 1/2 on every non-bootstrap step), and a finite
        oracle-recovering sample for both."""
        from advshadow_tpu.samplers import dpmpp2m_sample
        from advshadow_tpu.samplers.dpm import _boundary_times, dpmpp2m_tables

        coeffs = make_diffusion(1000, "linear")
        abar = np.asarray(coeffs.alphas_cumprod)
        for method in ("logsnr", "karras"):
            times = _boundary_times(abar, 1000, 20, method)
            assert times[0] == 999 and times[-1] == 0
            assert np.all(np.diff(times) < 0)
            tables = dpmpp2m_tables(abar, 1000, 20, method=method)
            for tab in tables:
                assert np.isfinite(np.asarray(tab, np.float64)).all()
            x_star = jnp.full(SHAPE, 0.25)
            out = dpmpp2m_sample(coeffs, oracle_denoiser(coeffs, x_star),
                                 jax.random.PRNGKey(0), SHAPE,
                                 sample_steps=20, method=method)
            assert np.isfinite(np.asarray(out)).all()
            np.testing.assert_allclose(np.asarray(out), np.asarray(x_star),
                                       atol=6e-2)
        # uniform-in-lambda: the 2M coefficient is ~1/2 on every step but
        # the bootstrap (the last couple of steps deviate where the
        # discrete t grid is too coarse to hit the target lambdas)
        c = np.asarray(dpmpp2m_tables(abar, 1000, 20, method="logsnr")[5])
        np.testing.assert_allclose(c[1:-2], 0.5, atol=0.05)
        import pytest

        with pytest.raises(NotImplementedError):
            _boundary_times(abar, 1000, 20, "nope")

    def test_sde_oracle_recovers_point_mass(self):
        """SDE-DPM-Solver++(2M) contracts to the data point for a perfect
        oracle: the injected noise is annihilated as sigma -> 0."""
        from advshadow_tpu.samplers import dpmpp2m_sde_sample

        coeffs = make_diffusion(1000, "linear")
        x_star = jnp.full(SHAPE, -0.31)
        out = dpmpp2m_sde_sample(coeffs, oracle_denoiser(coeffs, x_star),
                                 jax.random.PRNGKey(5), SHAPE,
                                 sample_steps=25, clip_denoised=False)
        assert np.isfinite(np.asarray(out)).all()
        np.testing.assert_allclose(np.asarray(out), np.asarray(x_star),
                                   atol=8e-2)

    def test_dynamic_threshold_noop_in_range_engages_on_overshoot(self):
        """Imagen dynamic thresholding (Saharia et al. 2022): the
        percentile scale saturates at 1, so an in-range oracle gives a
        BIT-IDENTICAL trajectory to the static clip; an overshooting
        oracle (|x0| > 1, the CFG failure mode) engages the rescale and
        keeps the effective x0 inside [-1, 1]."""
        from advshadow_tpu.samplers import dpmpp2m_sample

        coeffs = make_diffusion(1000, "linear")
        x_star = jnp.full(SHAPE, 0.2)
        fn = oracle_denoiser(coeffs, x_star)
        base = dpmpp2m_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                              sample_steps=10)
        dyn = dpmpp2m_sample(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                             sample_steps=10, dynamic_threshold=0.995)
        np.testing.assert_array_equal(np.asarray(base), np.asarray(dyn))

        # spatially-varying overshoot (a constant field is degenerate:
        # clip(v,-s,s)/s == clip(v,-1,1) when v is uniform) — the ramp is
        # what the percentile rescale preserves and the static clip flattens
        ramp = jnp.linspace(0.0, 3.0, int(np.prod(SHAPE))).reshape(SHAPE)
        hot = oracle_denoiser(coeffs, ramp)
        out = dpmpp2m_sample(coeffs, hot, jax.random.PRNGKey(0), SHAPE,
                             sample_steps=10, dynamic_threshold=0.995)
        assert np.isfinite(np.asarray(out)).all()
        # final step: x = alpha*x0_eff + sigma*eps with x0_eff in [-1,1]
        # and sigma ~ 0 at t=0
        assert np.abs(np.asarray(out)).max() <= 1.2
        ref = dpmpp2m_sample(coeffs, hot, jax.random.PRNGKey(0), SHAPE,
                             sample_steps=10)
        # static clip saturates the top of the ramp; the rescale keeps it
        # graded — the trajectories must genuinely diverge
        assert not np.allclose(np.asarray(out), np.asarray(ref))

    def test_dynamic_threshold_forwarded_to_sde_sampler(self):
        """dpmpp2m_sde_sample forwards dynamic_threshold into the shared
        scan (the SDE entry is a thin wrapper): an overshooting oracle must
        diverge from the static-clip SDE trajectory yet stay bounded."""
        from advshadow_tpu.samplers import dpmpp2m_sde_sample

        coeffs = make_diffusion(1000, "linear")
        ramp = jnp.linspace(0.0, 3.0, int(np.prod(SHAPE))).reshape(SHAPE)
        hot = oracle_denoiser(coeffs, ramp)
        dyn = dpmpp2m_sde_sample(coeffs, hot, jax.random.PRNGKey(0), SHAPE,
                                 sample_steps=10, dynamic_threshold=0.995)
        ref = dpmpp2m_sde_sample(coeffs, hot, jax.random.PRNGKey(0), SHAPE,
                                 sample_steps=10)
        assert np.isfinite(np.asarray(dyn)).all()
        assert np.abs(np.asarray(dyn)).max() <= 1.2
        assert not np.allclose(np.asarray(dyn), np.asarray(ref))

    def test_ddim_nonuniform_grids(self):
        """DDIM (both variants) accepts the shared logsnr/karras few-step
        grids: oracle recovery stays exact-ish, and the framework entry
        point keeps its reference pair-stride default."""
        from advshadow_tpu.samplers import ddim_sample_framework

        coeffs = make_diffusion(1000, "linear")
        x_star = jnp.full(SHAPE, 0.21)
        fn = oracle_denoiser(coeffs, x_star)
        for method in ("logsnr", "karras"):
            for entry in (ddim_sample, ddim_sample_framework):
                kw = (dict(ddim_timesteps=20) if entry is ddim_sample
                      else dict(sample_steps=20))
                out = entry(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                            method=method, **kw)
                assert np.isfinite(np.asarray(out)).all()
                np.testing.assert_allclose(np.asarray(out),
                                           np.asarray(x_star), atol=6e-2)
        # default path unchanged: framework stride, not a boundary grid
        a = ddim_sample_framework(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                                  sample_steps=20)
        b = ddim_sample_framework(coeffs, fn, jax.random.PRNGKey(0), SHAPE,
                                  sample_steps=20, method="framework")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=0)

    def test_sde_differs_from_ode_and_registry(self):
        from advshadow_tpu.samplers import make_sampler

        coeffs = make_diffusion(200, "linear")
        x_star = jnp.full(SHAPE, 0.1)
        fn = oracle_denoiser(coeffs, x_star)
        ode = make_sampler("dpmpp")(coeffs, fn, jax.random.PRNGKey(2),
                                    SHAPE, sample_steps=10)
        sde = make_sampler("dpmpp_sde")(coeffs, fn, jax.random.PRNGKey(2),
                                        SHAPE, sample_steps=10)
        assert float(jnp.max(jnp.abs(ode - sde))) > 1e-4


class TestGuidanceFixes:
    def _apply_fn(self, params, x, t, y=None):
        base = 0.05 * x
        if y is None:
            return base
        shift = jnp.where(y < 0, 0.0, y.astype(jnp.float32))
        return base + shift.reshape(-1, 1, 1, 1)

    def test_cfg_rescale_matches_formula(self):
        """cfg_rescale must implement Lin et al. eq. 15-16: shrink the
        guided prediction's per-sample std back to the conditional's."""
        labels = jnp.array([1, 3])
        x = jax.random.normal(jax.random.PRNGKey(0), SHAPE)
        t = jnp.array([5, 5])
        plain = make_denoise_fn(self._apply_fn, None, labels, 3.0)(x, t)
        out = make_denoise_fn(self._apply_fn, None, labels, 3.0,
                              cfg_rescale=0.7)(x, t)
        cond = self._apply_fn(None, x, t, labels)
        axes = (1, 2, 3)
        rescaled = plain * (jnp.std(cond, axis=axes, keepdims=True)
                            / jnp.std(plain, axis=axes, keepdims=True))
        expected = 0.7 * rescaled + 0.3 * plain
        np.testing.assert_allclose(np.asarray(out), np.asarray(expected),
                                   atol=1e-5)
        # phi=0 is a no-op
        out0 = make_denoise_fn(self._apply_fn, None, labels, 3.0,
                               cfg_rescale=0.0)(x, t)
        np.testing.assert_allclose(np.asarray(out0), np.asarray(plain),
                                   atol=0)

    def test_cfg_interval_gates_guidance(self):
        """Inside [t_lo, t_hi] the fused-CFG output; outside, the plain
        conditional prediction (Kynkäänniemi et al. guidance interval)."""
        labels = jnp.array([1, 3])
        x = jnp.ones(SHAPE)
        fn = make_denoise_fn(self._apply_fn, None, labels, 3.0,
                             cfg_interval=(100, 800))
        inside = fn(x, jnp.array([500, 500]))
        outside = fn(x, jnp.array([50, 50]))
        guided = make_denoise_fn(self._apply_fn, None, labels, 3.0)(
            x, jnp.array([500, 500]))
        cond = self._apply_fn(None, x, jnp.array([50, 50]), labels)
        np.testing.assert_allclose(np.asarray(inside), np.asarray(guided),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(outside), np.asarray(cond),
                                   atol=1e-6)
