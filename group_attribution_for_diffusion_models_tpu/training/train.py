"""Jitted diffusion train step.

TPU-native equivalent of the reference's Accelerate hot loop
(reference unconditional_generation/main.py:654-845): antithetic timestep
sampling, q-sample, U-Net eps prediction, MSE, global-norm clip, Adam, EMA —
all inside one compiled function. Data-parallel gradient psum happens
implicitly when the step is jitted with batch-axis sharding over a mesh
(parallel.mesh); no NCCL/DDP analogue is needed.

The step is pure: (state, batch, key) -> (state, metrics). The same factory
serves retraining, fine-tuning (gd), and gradient-ascent unlearning (ga via
the optimizer's maximize flag), and vmaps along the ensemble axis for
subset-parallel training (parallel.ensemble).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from ..config.registry import SchedulerSpec
from ..diffusion.schedulers import ScheduleState, add_noise, antithetic_timesteps
from .state import TrainState, ema_decay_schedule, ema_update


def diffusion_loss(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    images: jnp.ndarray,
    noise: jnp.ndarray,
    timesteps: jnp.ndarray,
    encoder_hidden_states: Optional[jnp.ndarray] = None,
    loss_weights: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Noise-prediction MSE; optional per-example weights (masked ensembles)."""
    x_t = add_noise(schedule, images, noise, timesteps)
    if encoder_hidden_states is not None:
        eps = apply_fn({"params": params}, x_t, timesteps, encoder_hidden_states)
    else:
        eps = apply_fn({"params": params}, x_t, timesteps)
    err = (eps - noise) ** 2
    if loss_weights is None:
        return jnp.mean(err)
    per_example = jnp.mean(err.reshape(err.shape[0], -1), axis=1)
    denom = jnp.maximum(jnp.sum(loss_weights), 1.0)
    return jnp.sum(per_example * loss_weights) / denom


def make_train_step(
    apply_fn: Callable,
    tx: optax.GradientTransformation,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    conditional: bool = False,
    ema_max_decay: float = 0.9999,
    ema_inv_gamma: float = 1.0,
    ema_power: float = 0.75,
    use_antithetic: bool = True,
    pmean_axis: Optional[str] = None,
    metric_norms: bool = True,
):
    """Build the jittable train step for a model/schedule/optimizer triple.

    `pmean_axis`: mesh axis name to average loss/grads over before the
    optimizer update — for manual (shard_map) data parallelism, where each
    shard computes on its slice of the batch and the psum is explicit
    instead of inserted by GSPMD.

    `metric_norms`: include grad/param global norms in the metrics dict.
    Off in the ensemble hot loop — the param-norm reduce alone re-reads the
    full fp32 parameter set every step (~1.1 GB HBM at the 8x35.7M bench
    config; the 4.9% `multiply_reduce_fusion` row in
    docs/profile_cifar_train.txt), and no ensemble consumer logs norms.
    """

    def train_step(
        state: TrainState,
        images: jnp.ndarray,
        key: jax.Array,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        loss_weights: Optional[jnp.ndarray] = None,
    ) -> Tuple[TrainState, dict]:
        key_t, key_n = jax.random.split(key)
        batch = images.shape[0]
        if use_antithetic:
            timesteps = antithetic_timesteps(key_t, batch, spec.num_train_timesteps)
        else:
            timesteps = jax.random.randint(
                key_t, (batch,), 0, spec.num_train_timesteps
            )
        noise = jax.random.normal(key_n, images.shape, dtype=images.dtype)

        def loss_fn(params):
            return diffusion_loss(
                apply_fn,
                params,
                schedule,
                images,
                noise,
                timesteps,
                encoder_hidden_states if conditional else None,
                loss_weights,
            )

        loss, grads = jax.value_and_grad(loss_fn)(state.params)
        if pmean_axis is not None:
            loss = jax.lax.pmean(loss, pmean_axis)
            grads = jax.lax.pmean(grads, pmean_axis)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)

        step = state.step + 1
        decay = ema_decay_schedule(
            step, ema_max_decay, False, ema_inv_gamma, ema_power
        )
        ema_params = ema_update(state.ema_params, params, decay)

        new_state = TrainState(
            params=params, ema_params=ema_params, opt_state=opt_state, step=step
        )
        metrics = {"loss": loss}
        if metric_norms:
            metrics["grad_norm"] = optax.global_norm(grads)
            metrics["param_norm"] = optax.global_norm(params)
        return new_state, metrics

    return train_step
