"""Scheduler math vs hand-computed / closed-form values (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec
from group_attribution_for_diffusion_models_tpu.diffusion import (
    add_noise,
    antithetic_timesteps,
    ddim_step,
    ddpm_step,
    inference_timesteps,
    make_betas,
    make_schedule,
    pred_original_sample,
)


def test_linear_betas_endpoints():
    spec = SchedulerSpec()
    betas = make_betas(spec)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 1e-4, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.02, rtol=1e-6)


def test_scaled_linear_betas():
    spec = SchedulerSpec(beta_schedule="scaled_linear", beta_start=0.0015, beta_end=0.0195)
    betas = make_betas(spec)
    # sqrt-space linspace squared: midpoint is ((sqrt(b0)+sqrt(bT))/2)^2.
    mid_expected = ((0.0015**0.5 + 0.0195**0.5) / 2) ** 2
    # T=1000 even => midpoint is between indices 499 and 500.
    mid_actual = (betas[499] + betas[500]) / 2
    np.testing.assert_allclose(mid_actual, mid_expected, rtol=1e-4)


def test_add_noise_closed_form():
    spec = SchedulerSpec()
    state = make_schedule(spec)
    x0 = jnp.ones((2, 4, 4, 3))
    noise = jnp.full((2, 4, 4, 3), 2.0)
    t = jnp.array([0, 999])
    out = add_noise(state, x0, noise, t)
    acp = np.cumprod(1 - np.asarray(make_betas(spec), dtype=np.float64))
    for i, ti in enumerate([0, 999]):
        expected = np.sqrt(acp[ti]) * 1.0 + np.sqrt(1 - acp[ti]) * 2.0
        np.testing.assert_allclose(out[i, 0, 0, 0], expected, rtol=1e-4)


def test_pred_original_roundtrip():
    """x0 -> add_noise -> pred_original recovers x0 exactly given true eps."""
    spec = SchedulerSpec()
    state = make_schedule(spec)
    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (3, 8, 8, 3))
    noise = jax.random.normal(jax.random.PRNGKey(1), x0.shape)
    t = jnp.array([10, 500, 990])
    x_t = add_noise(state, x0, noise, t)
    rec = pred_original_sample(state, noise, t, x_t)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x0), atol=1e-3)


def test_ddim_step_deterministic_eta0():
    """With perfect eps and eta=0, DDIM stepping is exactly the posterior mean."""
    spec = SchedulerSpec(clip_sample=False)
    state = make_schedule(spec)
    x0 = jnp.full((1, 4, 4, 3), 0.5)
    noise = jnp.full((1, 4, 4, 3), -0.3)
    t = jnp.array([700])
    t_prev = jnp.array([600])
    x_t = add_noise(state, x0, noise, t)
    x_prev = ddim_step(state, spec, noise, t, t_prev, x_t)
    expected = add_noise(state, x0, noise, t_prev)
    np.testing.assert_allclose(np.asarray(x_prev), np.asarray(expected), atol=1e-4)


def test_ddim_final_step_returns_x0():
    spec = SchedulerSpec(clip_sample=False)
    state = make_schedule(spec)
    x0 = jnp.full((1, 2, 2, 1), 0.25)
    noise = jnp.full((1, 2, 2, 1), 1.0)
    t = jnp.array([9])
    x_t = add_noise(state, x0, noise, t)
    out = ddim_step(state, spec, noise, t, jnp.array([-1]), x_t)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddpm_step_t0_no_noise():
    spec = SchedulerSpec(clip_sample=False)
    state = make_schedule(spec)
    x0 = jnp.full((1, 2, 2, 1), 0.3)
    eps = jnp.full((1, 2, 2, 1), 0.7)
    t = jnp.array([0])
    x_t = add_noise(state, x0, eps, t)
    z = jnp.full(x_t.shape, 5.0)  # must be ignored at t=0
    out = ddpm_step(state, spec, eps, t, x_t, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(x0), atol=1e-4)


def test_ddpm_step_mean_matches_posterior():
    spec = SchedulerSpec(clip_sample=False, variance_type="fixed_small")
    state = make_schedule(spec)
    key = jax.random.PRNGKey(3)
    x0 = jax.random.normal(key, (1, 4, 4, 1)) * 0.1
    eps = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.array([500])
    x_t = add_noise(state, x0, eps, t)
    out = ddpm_step(state, spec, eps, t, x_t, jnp.zeros_like(x_t))
    betas = np.asarray(state.betas, np.float64)
    acp = np.cumprod(1 - betas)
    a_t, acp_t, acp_p = 1 - betas[500], acp[500], acp[499]
    mean = (
        np.sqrt(acp_p) * betas[500] / (1 - acp_t) * np.asarray(x0)
        + np.sqrt(a_t) * (1 - acp_p) / (1 - acp_t) * np.asarray(x_t)
    )
    np.testing.assert_allclose(np.asarray(out), mean, atol=1e-4)


def test_inference_timesteps_leading():
    ts = inference_timesteps(1000, 100, "leading")
    assert ts.shape == (100,)
    assert ts[0] == 990 and ts[-1] == 0
    assert np.all(np.diff(ts) == -10)


def test_antithetic_timesteps_mirrored():
    t = antithetic_timesteps(jax.random.PRNGKey(0), 8, 1000)
    t = np.asarray(t)
    assert t.shape == (8,)
    # First half and mirrored half satisfy t + t' = T - 1 pairwise.
    half = 8 // 2 + 1
    mirrored = 1000 - t[:half] - 1
    np.testing.assert_array_equal(t[half:8], mirrored[: 8 - half])
    assert (t >= 0).all() and (t < 1000).all()


def test_antithetic_timesteps_odd_batch():
    t = antithetic_timesteps(jax.random.PRNGKey(1), 7, 1000)
    assert t.shape == (7,)
