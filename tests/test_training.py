"""Training-engine tests: loss decreases, EMA schedule, ascent mode."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.training import (
    TrainState,
    ema_decay_schedule,
    make_optimizer,
    make_train_step,
)

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _setup(maximize=False, lr=1e-3):
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    x = jnp.zeros((4, 8, 8, 3))
    t = jnp.zeros((4,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    tx = make_optimizer("adam", lr=lr, maximize=maximize)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model.apply, tx, schedule, spec))
    return state, step


def test_loss_decreases():
    state, step = _setup()
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3), minval=-1, maxval=1)
    losses = []
    for i in range(30):
        state, metrics = step(state, imgs, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert int(state.step) == 30


def test_gradient_ascent_increases_loss():
    state, step = _setup(maximize=True)
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3), minval=-1, maxval=1)
    losses = []
    for i in range(20):
        state, metrics = step(state, imgs, jax.random.PRNGKey(100 + i))
        losses.append(float(metrics["loss"]))
    assert np.mean(losses[-3:]) > np.mean(losses[:3])


def test_ema_decay_schedule_values():
    # diffusers get_decay with use_ema_warmup=False: (1+s)/(10+s) clamped.
    assert float(ema_decay_schedule(jnp.array(0))) == pytest.approx(0.1)
    assert float(ema_decay_schedule(jnp.array(90))) == pytest.approx(0.91)
    assert float(ema_decay_schedule(jnp.array(10**7))) == pytest.approx(0.9999)


def test_ema_tracks_params():
    state, step = _setup()
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3), minval=-1, maxval=1)
    for i in range(3):
        state, _ = step(state, imgs, jax.random.PRNGKey(i))
    # Early EMA decay is small, so EMA should be close to params but not equal.
    p = jax.tree_util.tree_leaves(state.params)[0]
    e = jax.tree_util.tree_leaves(state.ema_params)[0]
    assert not np.allclose(np.asarray(p), np.asarray(e))
    diff = float(jnp.abs(p - e).max())
    assert diff < 0.1


def test_grad_clip_applied():
    state, step = _setup()
    imgs = 100.0 * jnp.ones((4, 8, 8, 3))  # absurd inputs -> huge grads
    _, metrics = step(state, imgs, jax.random.PRNGKey(0))
    assert jnp.isfinite(metrics["grad_norm"])


def test_masked_loss_weights():
    """Zero-weighted examples contribute nothing (ensemble-axis masking)."""
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    x4 = jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32))["params"]

    from group_attribution_for_diffusion_models_tpu.training import diffusion_loss

    noise = jax.random.normal(jax.random.PRNGKey(3), x4.shape)
    t = jnp.array([5, 17, 100, 900])
    w_first_two = jnp.array([1.0, 1.0, 0.0, 0.0])
    loss_masked = diffusion_loss(
        model.apply, params, schedule, x4, noise, t, loss_weights=w_first_two
    )
    loss_subset = diffusion_loss(
        model.apply, params, schedule, x4[:2], noise[:2], t[:2],
        loss_weights=jnp.ones(2),
    )
    np.testing.assert_allclose(float(loss_masked), float(loss_subset), rtol=1e-5)
