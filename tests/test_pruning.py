"""Pruning shape invariants + importance criteria (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.pruning import (
    count_params,
    magnitude_importance,
    prune_unet,
    random_importance,
    resnet_block_paths,
    taylor_importance,
)

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(16, 32),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _params():
    model = UNet2D(TINY)
    return model, model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]


def test_block_discovery_and_magnitude_scores():
    _, params = _params()
    paths = resnet_block_paths(params)
    assert "mid_res_0" in paths and "down_0_res_0" in paths
    scores = magnitude_importance(params)
    for path in paths:
        assert scores[path].shape == (params[path]["conv1"]["kernel"].shape[-1],)
        assert (scores[path] >= 0).all()


def test_prune_roundtrip_forward():
    """Pruned (spec, params) re-instantiate and run; params shrink."""
    model, params = _params()
    spec2, params2 = prune_unet(TINY, params, 0.5, magnitude_importance(params))
    assert spec2.pruned_channels  # something was pruned
    pruned_model = UNet2D(spec2)
    x = jnp.ones((2, 8, 8, 3))
    t = jnp.zeros((2,), jnp.int32)
    out = pruned_model.apply({"params": params2}, x, t)
    assert out.shape == (2, 8, 8, 3)
    assert jnp.isfinite(out).all()
    assert count_params(params2) < count_params(params)

    # Shapes in params2 match a fresh init of the pruned spec exactly.
    fresh = pruned_model.init(jax.random.PRNGKey(1), x, t)["params"]
    s1 = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, params2)
    s2 = jax.tree_util.tree_map(lambda a: np.asarray(a).shape, fresh)
    assert s1 == s2


def test_prune_keeps_top_channels():
    """The kept channels are exactly the highest-importance ones."""
    _, params = _params()
    path = "mid_res_0"
    hidden = params[path]["conv1"]["kernel"].shape[-1]
    scores = {p: np.ones(params[p]["conv1"]["kernel"].shape[-1]) for p in resnet_block_paths(params)}
    custom = np.arange(hidden, dtype=float)  # channel i has importance i
    scores[path] = custom
    spec2, params2 = prune_unet(TINY, params, 0.5, scores, group_size=4)
    kept = spec2.pruned_channels[path]
    expected_idx = np.sort(np.argsort(custom)[::-1][:kept])
    np.testing.assert_array_equal(
        np.asarray(params2[path]["conv1"]["kernel"])[..., :],
        np.asarray(params[path]["conv1"]["kernel"])[..., expected_idx],
    )


def test_prune_zero_ratio_identity():
    _, params = _params()
    spec2, params2 = prune_unet(TINY, params, 0.0, magnitude_importance(params))
    assert count_params(params2) == count_params(params)
    assert not spec2.pruned_channels


def test_prune_bad_ratio_raises():
    _, params = _params()
    with pytest.raises(ValueError):
        prune_unet(TINY, params, 1.0, magnitude_importance(params))


def test_taylor_importance_accumulates():
    model, params = _params()
    schedule = make_schedule(SchedulerSpec())
    images = np.random.RandomState(0).uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    scores = taylor_importance(
        model.apply, params, schedule, images,
        num_timesteps=1000, timestep_stride=250, batch_size=8,
    )
    for path in resnet_block_paths(params):
        assert scores[path].shape == (params[path]["conv1"]["kernel"].shape[-1],)
        assert (scores[path] >= 0).all()
        assert scores[path].sum() > 0


def test_taylor_early_stop():
    model, params = _params()
    schedule = make_schedule(SchedulerSpec())
    images = np.random.RandomState(0).uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    # Threshold 1.0 stops after max-loss is set (first step that dips below max).
    s_stop = taylor_importance(
        model.apply, params, schedule, images,
        num_timesteps=1000, timestep_stride=100, loss_threshold=1.0, batch_size=8,
    )
    s_full = taylor_importance(
        model.apply, params, schedule, images,
        num_timesteps=1000, timestep_stride=100, batch_size=8,
    )
    total_stop = sum(v.sum() for v in s_stop.values())
    total_full = sum(v.sum() for v in s_full.values())
    assert total_stop <= total_full
