"""WoodFisher influence-unlearning tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.unlearn import (
    apply_perturbation,
    average_gradient,
    influence_unlearn,
    woodfisher_inv_hvp,
)

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _setup():
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    return model, params, schedule, spec


def test_average_gradient_deterministic():
    model, params, schedule, spec = _setup()
    imgs = np.random.RandomState(0).uniform(-1, 1, (16, 8, 8, 3)).astype(np.float32)
    g1 = average_gradient(model.apply, params, schedule, spec, imgs, batch_size=8, seed=3)
    g2 = average_gradient(model.apply, params, schedule, spec, imgs, batch_size=8, seed=3)
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    assert float(jnp.linalg.norm(g1)) > 0


def test_apply_perturbation_roundtrip():
    model, params, schedule, spec = _setup()
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    delta = jnp.ones((n,))
    p2 = apply_perturbation(params, delta, alpha=0.5)
    l1 = jax.tree_util.tree_leaves(params)
    l2 = jax.tree_util.tree_leaves(p2)
    for a, b in zip(l1, l2):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a) + 0.5, atol=1e-6)


def test_woodfisher_shrinks_along_gradients():
    model, params, schedule, spec = _setup()
    imgs = np.random.RandomState(1).uniform(-1, 1, (16, 8, 8, 3)).astype(np.float32)
    v = average_gradient(model.apply, params, schedule, spec, imgs, batch_size=8)
    out = woodfisher_inv_hvp(
        model.apply, params, schedule, spec, imgs, v,
        num_batches=4, batch_size=4,
    )
    assert out.shape == v.shape
    assert jnp.isfinite(out).all()
    # H^-1-style damping contracts the vector along sampled gradient directions.
    assert float(jnp.linalg.norm(out)) <= float(jnp.linalg.norm(v)) * 1.5


def test_influence_unlearn_changes_params():
    model, params, schedule, spec = _setup()
    rng = np.random.RandomState(2)
    removed = rng.uniform(-1, 1, (4, 8, 8, 3)).astype(np.float32)
    remaining = rng.uniform(-1, 1, (8, 8, 8, 3)).astype(np.float32)
    new_params = influence_unlearn(
        model.apply, params, schedule, spec, removed, remaining,
        alpha=1.0, batch_size=4, wf_batches=2,
    )
    diffs = [
        float(jnp.abs(a - b).max())
        for a, b in zip(
            jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(new_params)
        )
    ]
    assert max(diffs) > 0
    for leaf in jax.tree_util.tree_leaves(new_params):
        assert jnp.isfinite(leaf).all()
