"""Compiled DDIM/DDPM sampling loops.

Replaces the reference's Python-loop diffusers pipelines
(reference src/diffusion_utils.py:360-416: DDIMPipeline /
LDMPipeline with 100 inference steps). The denoising loop is a `lax.scan`
over a static timestep grid inside one jit, so the 100-step sampler is a
single XLA program — the per-step Python/dispatch overhead that dominates
small-model GPU sampling disappears, and the sampler vmaps along the
ensemble axis for batched subset-model sampling.

Outputs are float images in [0, 1] NHWC (the diffusers "numpy" postprocess).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..config.registry import SchedulerSpec
from .schedulers import (
    ScheduleState,
    ddim_step,
    ddpm_step,
    inference_timesteps,
    make_schedule,
)


def sample_loop(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    shape: Tuple[int, ...],
    key: jax.Array,
    num_inference_steps: int = 100,
    eta: float = 0.0,
    kind: Optional[str] = None,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    decode_fn: Optional[Callable] = None,
    postprocess: bool = True,
) -> jnp.ndarray:
    """Generate a batch of images/latents. `kind` defaults to spec.kind.

    For DDIM with eta=0 the loop is deterministic given `key` (only the
    initial noise consumes randomness) — the paired-seed generation that
    local model behaviors rely on (reference calculate_local_scores.py).

    `decode_fn` maps final latents to [-1, 1] images inside the same XLA
    program — the LDM path, where the U-Net diffuses VQ-VAE latents and the
    frozen decoder renders pixels (reference src/diffusion_utils.py:253-276
    builds an LDMPipeline whose vqvae.decode runs after the denoise loop).
    """
    kind = kind or spec.kind
    key_init, key_steps = jax.random.split(key)
    x = jax.random.normal(key_init, shape, dtype=jnp.float32)

    ts = jnp.asarray(
        inference_timesteps(
            spec.num_train_timesteps,
            num_inference_steps,
            spec.timestep_spacing,
            spec.steps_offset,
        )
    )
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1])])
    step_keys = jax.random.split(key_steps, num_inference_steps)

    def body(x, inputs):
        t, t_prev, k = inputs
        t_b = jnp.broadcast_to(t, (shape[0],))
        if encoder_hidden_states is not None:
            eps = apply_fn({"params": params}, x, t_b, encoder_hidden_states)
        else:
            eps = apply_fn({"params": params}, x, t_b)
        if kind == "ddim":
            noise = jax.random.normal(k, shape) if eta > 0 else None
            x = ddim_step(
                schedule, spec, eps, t_b, jnp.broadcast_to(t_prev, (shape[0],)),
                x, eta=eta, noise=noise,
            )
        else:
            noise = jax.random.normal(k, shape)
            x = ddpm_step(schedule, spec, eps, t_b, x, noise)
        return x, None

    x, _ = jax.lax.scan(body, x, (ts, ts_prev, step_keys))
    if not postprocess:
        return x  # raw model-space output (e.g. unclipped LDM latents)
    if decode_fn is not None:
        x = decode_fn(x)
    return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0)


def sample_with_trajectory(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    shape: Tuple[int, ...],
    key: jax.Array,
    num_inference_steps: int = 100,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """DDIM sampling that also returns the latent trajectory.

    Returns (final images in [0,1], trajectory (T, B, H, W, C) of x_t BEFORE
    each denoise step, timesteps (T,)) — the "Journey TRAK" capture the
    reference implements with a pipeline callback (reference
    d_trak_grad.py:450-494, grad_text_to_image_lora.py:489-528).
    """
    key_init, _ = jax.random.split(key)
    x = jax.random.normal(key_init, shape, dtype=jnp.float32)
    ts = jnp.asarray(
        inference_timesteps(
            spec.num_train_timesteps, num_inference_steps,
            spec.timestep_spacing, spec.steps_offset,
        )
    )
    ts_prev = jnp.concatenate([ts[1:], jnp.array([-1])])

    def body(x, inputs):
        t, t_prev = inputs
        t_b = jnp.broadcast_to(t, (shape[0],))
        if encoder_hidden_states is not None:
            eps = apply_fn({"params": params}, x, t_b, encoder_hidden_states)
        else:
            eps = apply_fn({"params": params}, x, t_b)
        x_next = ddim_step(
            schedule, spec, eps, t_b, jnp.broadcast_to(t_prev, (shape[0],)), x
        )
        return x_next, x  # capture pre-step latent

    x, trajectory = jax.lax.scan(body, x, (ts, ts_prev))
    return jnp.clip(x / 2.0 + 0.5, 0.0, 1.0), trajectory, ts


def make_sampler(
    apply_fn: Callable,
    spec: SchedulerSpec,
    shape: Tuple[int, ...],
    num_inference_steps: int = 100,
    eta: float = 0.0,
    kind: Optional[str] = None,
    decode_fn: Optional[Callable] = None,
):
    """Jit-once sampler factory: (params, key) -> images.

    DDIM sampling always rebuilds the schedule from the spec — the reference
    similarly re-instantiates a fresh DDIMScheduler for inference
    (reference src/diffusion_utils.py:404-407). For latent workloads pass
    `decode_fn` so the VQ decode fuses into the same compiled program.
    """
    schedule = make_schedule(spec)

    @jax.jit
    def sampler(params, key):
        return sample_loop(
            apply_fn, params, schedule, spec, shape, key,
            num_inference_steps=num_inference_steps, eta=eta, kind=kind,
            decode_fn=decode_fn,
        )

    return sampler
