"""Sampler tests: shape/range, determinism, DDIM-vs-DDPM paths."""

import jax
import jax.numpy as jnp
import numpy as np

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.diffusion.sampling import (
    make_sampler,
    sample_loop,
)
from group_attribution_for_diffusion_models_tpu.models import UNet2D

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _model_params():
    model = UNet2D(TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    return model, params


def test_ddim_sampler_shape_range_determinism():
    model, params = _model_params()
    spec = SchedulerSpec()
    sampler = make_sampler(model.apply, spec, (2, 8, 8, 3), num_inference_steps=5, kind="ddim")
    imgs1 = sampler(params, jax.random.PRNGKey(7))
    imgs2 = sampler(params, jax.random.PRNGKey(7))
    imgs3 = sampler(params, jax.random.PRNGKey(8))
    assert imgs1.shape == (2, 8, 8, 3)
    assert float(imgs1.min()) >= 0.0 and float(imgs1.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(imgs1), np.asarray(imgs2))
    assert not np.array_equal(np.asarray(imgs1), np.asarray(imgs3))


def test_ddpm_sampler_runs():
    model, params = _model_params()
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    imgs = sample_loop(
        model.apply, params, schedule, spec, (1, 8, 8, 3),
        jax.random.PRNGKey(0), num_inference_steps=4, kind="ddpm",
    )
    assert imgs.shape == (1, 8, 8, 3)
    assert jnp.isfinite(imgs).all()


def test_ddim_eta_changes_output():
    model, params = _model_params()
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    a = sample_loop(
        model.apply, params, schedule, spec, (1, 8, 8, 3),
        jax.random.PRNGKey(1), num_inference_steps=4, kind="ddim", eta=0.0,
    )
    b = sample_loop(
        model.apply, params, schedule, spec, (1, 8, 8, 3),
        jax.random.PRNGKey(1), num_inference_steps=4, kind="ddim", eta=1.0,
    )
    assert not np.array_equal(np.asarray(a), np.asarray(b))
