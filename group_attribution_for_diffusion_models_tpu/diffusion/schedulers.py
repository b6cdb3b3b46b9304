"""DDPM/DDIM noise schedules as pure, jittable functions.

TPU-native replacement for the stateful diffusers DDPMScheduler/DDIMScheduler
the reference configures (reference src/ddpm_config.py:83-100,452-461) and
steps through in its sampling pipelines (reference src/diffusion_utils.py:
360-416). All schedule tables are precomputed once into a `ScheduleState`
pytree; `add_noise`, `ddpm_step` and `ddim_step` are shape-static pure
functions designed to sit inside `lax.scan` sampling loops and jitted
training steps.

Semantics mirror diffusers v0.24 so checkpoints trained here are numerically
comparable with the reference's training/inference math:

* beta schedules: linear, scaled_linear (sqrt-space linspace), cosine.
* `add_noise`: sqrt(acp_t) x0 + sqrt(1-acp_t) eps.
* DDPM ancestral step with fixed_small/fixed_large variance and optional
  sample clipping.
* DDIM step with eta, leading/trailing/linspace timestep spacing and
  set_alpha_to_one semantics.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import SchedulerSpec


class ScheduleState(NamedTuple):
    """Precomputed noise-schedule tables, all shape (T,) float32."""

    betas: jnp.ndarray
    alphas: jnp.ndarray
    alphas_cumprod: jnp.ndarray


def make_betas(spec: SchedulerSpec) -> np.ndarray:
    """Build the beta table for a schedule spec (host-side numpy)."""
    t = spec.num_train_timesteps
    if spec.beta_schedule == "linear":
        betas = np.linspace(spec.beta_start, spec.beta_end, t, dtype=np.float64)
    elif spec.beta_schedule == "scaled_linear":
        betas = (
            np.linspace(spec.beta_start**0.5, spec.beta_end**0.5, t, dtype=np.float64)
            ** 2
        )
    elif spec.beta_schedule == "squaredcos_cap_v2":
        def alpha_bar(s):
            return np.cos((s + 0.008) / 1.008 * np.pi / 2) ** 2

        i = np.arange(t, dtype=np.float64)
        betas = np.minimum(1 - alpha_bar((i + 1) / t) / alpha_bar(i / t), 0.999)
    else:
        raise ValueError(f"unknown beta_schedule {spec.beta_schedule!r}")
    return betas.astype(np.float32)


def make_schedule(spec: SchedulerSpec) -> ScheduleState:
    betas = jnp.asarray(make_betas(spec))
    alphas = 1.0 - betas
    return ScheduleState(
        betas=betas, alphas=alphas, alphas_cumprod=jnp.cumprod(alphas)
    )


def _extract(table: jnp.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    """Gather per-timestep scalars and broadcast to an image batch rank."""
    vals = table[t]
    return vals.reshape(vals.shape + (1,) * (ndim - vals.ndim))


def add_noise(
    state: ScheduleState, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward diffusion q(x_t | x_0) (matches diffusers add_noise)."""
    acp = _extract(state.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * x0 + jnp.sqrt(1.0 - acp) * noise


def velocity_target(
    state: ScheduleState, x0: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """v-prediction target sqrt(acp) eps - sqrt(1-acp) x0."""
    acp = _extract(state.alphas_cumprod, t, x0.ndim)
    return jnp.sqrt(acp) * noise - jnp.sqrt(1.0 - acp) * x0


def antithetic_timesteps(key: jax.Array, batch: int, num_train_timesteps: int) -> jnp.ndarray:
    """Antithetic timestep sampling for variance reduction.

    Draws ceil(B/2)+? uniform timesteps and mirrors them (T - t - 1), exactly
    the variance-reduction scheme of the reference hot loop
    (reference unconditional_generation/main.py:683-696).
    """
    half = batch // 2 + 1
    t = jax.random.randint(key, (half,), 0, num_train_timesteps)
    return jnp.concatenate([t, num_train_timesteps - t - 1])[:batch]


def pred_original_sample(
    state: ScheduleState,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    x_t: jnp.ndarray,
    prediction_type: str = "epsilon",
) -> jnp.ndarray:
    """Recover x0-hat from a model prediction at timestep t."""
    acp = _extract(state.alphas_cumprod, t, x_t.ndim)
    if prediction_type == "epsilon":
        return (x_t - jnp.sqrt(1.0 - acp) * model_out) / jnp.sqrt(acp)
    if prediction_type == "sample":
        return model_out
    if prediction_type == "v_prediction":
        return jnp.sqrt(acp) * x_t - jnp.sqrt(1.0 - acp) * model_out
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def ddpm_step(
    state: ScheduleState,
    spec: SchedulerSpec,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    x_t: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One ancestral DDPM reverse step x_t -> x_{t-1}.

    `noise` must be pre-sampled gaussian noise of x_t's shape (pure function:
    the caller owns the PRNG). Variance follows diffusers fixed_small /
    fixed_large with the t==0 no-noise convention.
    """
    ndim = x_t.ndim
    acp_t = _extract(state.alphas_cumprod, t, ndim)
    # alpha_cumprod at t-1 (1.0 when t == 0).
    acp_prev = _extract(
        jnp.concatenate([jnp.ones((1,), state.alphas_cumprod.dtype), state.alphas_cumprod[:-1]]),
        t,
        ndim,
    )
    beta_t = _extract(state.betas, t, ndim)
    alpha_t = _extract(state.alphas, t, ndim)

    x0 = pred_original_sample(state, model_out, t, x_t, spec.prediction_type)
    if spec.clip_sample:
        x0 = jnp.clip(x0, -spec.clip_sample_range, spec.clip_sample_range)

    # mu_t coefficients (DDPM eq. 7).
    coef_x0 = jnp.sqrt(acp_prev) * beta_t / (1.0 - acp_t)
    coef_xt = jnp.sqrt(alpha_t) * (1.0 - acp_prev) / (1.0 - acp_t)
    mean = coef_x0 * x0 + coef_xt * x_t

    if spec.variance_type == "fixed_small":
        var = beta_t * (1.0 - acp_prev) / (1.0 - acp_t)
    elif spec.variance_type == "fixed_large":
        var = beta_t
    else:
        raise ValueError(f"unknown variance_type {spec.variance_type!r}")
    var = jnp.clip(var, min=1e-20)

    nonzero = (t > 0).reshape((-1,) + (1,) * (ndim - 1)).astype(x_t.dtype)
    return mean + nonzero * jnp.sqrt(var) * noise


def ddim_step(
    state: ScheduleState,
    spec: SchedulerSpec,
    model_out: jnp.ndarray,
    t: jnp.ndarray,
    t_prev: jnp.ndarray,
    x_t: jnp.ndarray,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One DDIM step x_t -> x_{t_prev} (Song et al. 2021, eq. 12).

    `t_prev < 0` selects the final alpha_cumprod (1.0 under set_alpha_to_one,
    matching diffusers DDIMScheduler).
    """
    ndim = x_t.ndim
    acp_t = _extract(state.alphas_cumprod, t, ndim)
    final_acp = 1.0 if spec.set_alpha_to_one else float(state.alphas_cumprod[0])
    acp_prev = jnp.where(
        (t_prev >= 0).reshape((-1,) + (1,) * (ndim - 1)),
        _extract(state.alphas_cumprod, jnp.maximum(t_prev, 0), ndim),
        jnp.full((1,) * ndim, final_acp, dtype=x_t.dtype),
    )

    x0 = pred_original_sample(state, model_out, t, x_t, spec.prediction_type)
    if spec.clip_sample:
        x0 = jnp.clip(x0, -spec.clip_sample_range, spec.clip_sample_range)
    # Re-derive eps from the (possibly clipped) x0 like diffusers does.
    eps = (x_t - jnp.sqrt(acp_t) * x0) / jnp.sqrt(1.0 - acp_t)

    var = (1.0 - acp_prev) / (1.0 - acp_t) * (1.0 - acp_t / acp_prev)
    sigma = eta * jnp.sqrt(var)

    dir_xt = jnp.sqrt(jnp.clip(1.0 - acp_prev - sigma**2, min=0.0)) * eps
    x_prev = jnp.sqrt(acp_prev) * x0 + dir_xt
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires caller-provided noise")
        x_prev = x_prev + sigma * noise
    return x_prev


def inference_timesteps(
    num_train_timesteps: int,
    num_inference_steps: int,
    spacing: str = "leading",
    steps_offset: int = 0,
) -> np.ndarray:
    """Descending timestep grid for sampling (diffusers timestep_spacing)."""
    if spacing == "leading":
        ratio = num_train_timesteps // num_inference_steps
        ts = (np.arange(num_inference_steps) * ratio).round()[::-1].astype(np.int64)
        ts = ts + steps_offset
    elif spacing == "trailing":
        ratio = num_train_timesteps / num_inference_steps
        ts = np.round(np.arange(num_train_timesteps, 0, -ratio)).astype(np.int64) - 1
    elif spacing == "linspace":
        ts = (
            np.linspace(0, num_train_timesteps - 1, num_inference_steps)
            .round()[::-1]
            .astype(np.int64)
        )
    else:
        raise ValueError(f"unknown timestep_spacing {spacing!r}")
    return ts
