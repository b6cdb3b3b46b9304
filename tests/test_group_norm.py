"""Fused GroupNorm(+SiLU) Pallas kernel vs the XLA reference path.

The interpret-mode kernel must match _xla_group_norm_silu (itself the torch
GroupNorm semantics the reference's diffusers blocks use) for outputs and for
gradients w.r.t. x/gamma/beta, including under the ensemble member vmap.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.ops.group_norm import (
    _xla_group_norm_silu,
    group_norm_silu,
)


def _rand(key, shape, dtype=jnp.float32):
    return jax.random.normal(key, shape, jnp.float32).astype(dtype)


@pytest.mark.parametrize("silu", [True, False])
@pytest.mark.parametrize("shape,groups", [((3, 8, 8, 64), 32), ((2, 16, 48), 8)])
def test_forward_matches_xla(shape, groups, silu):
    kx, kg, kb = jax.random.split(jax.random.PRNGKey(0), 3)
    x = _rand(kx, shape) * 3.0 + 0.5
    gamma = _rand(kg, (shape[-1],)) + 1.0
    beta = _rand(kb, (shape[-1],))
    got = group_norm_silu(
        x, gamma, beta, groups=groups, eps=1e-6, silu=silu, interpret=True
    )
    want = _xla_group_norm_silu(x, gamma, beta, groups, 1e-6, silu, x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


@pytest.mark.parametrize("silu", [True, False])
def test_gradients_match_xla(silu):
    shape, groups = (2, 8, 8, 64), 16
    kx, kg, kb, kc = jax.random.split(jax.random.PRNGKey(1), 4)
    x = _rand(kx, shape)
    gamma = _rand(kg, (shape[-1],)) + 1.0
    beta = _rand(kb, (shape[-1],))
    cot = _rand(kc, shape)

    def loss_pallas(x, gamma, beta):
        y = group_norm_silu(
            x, gamma, beta, groups=groups, eps=1e-5, silu=silu, interpret=True
        )
        return jnp.sum(y * cot)

    def loss_xla(x, gamma, beta):
        y = _xla_group_norm_silu(x, gamma, beta, groups, 1e-5, silu, x.dtype)
        return jnp.sum(y * cot)

    got = jax.grad(loss_pallas, argnums=(0, 1, 2))(x, gamma, beta)
    want = jax.grad(loss_xla, argnums=(0, 1, 2))(x, gamma, beta)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), atol=3e-5)


def test_vmap_members_match_xla():
    """The ensemble axis: params and activations both carry a member dim."""
    m, shape, groups = 3, (2, 4, 4, 32), 8
    keys = jax.random.split(jax.random.PRNGKey(2), 3)
    x = _rand(keys[0], (m,) + shape)
    gamma = _rand(keys[1], (m, shape[-1])) + 1.0
    beta = _rand(keys[2], (m, shape[-1]))

    def f(x, g, b):
        return group_norm_silu(x, g, b, groups=groups, interpret=True)

    got = jax.vmap(f)(x, gamma, beta)
    want = jax.vmap(
        lambda x, g, b: _xla_group_norm_silu(x, g, b, groups, 1e-6, True, x.dtype)
    )(x, gamma, beta)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_bf16_output_dtype():
    x = _rand(jax.random.PRNGKey(3), (2, 4, 4, 32), jnp.bfloat16)
    gamma = jnp.ones((32,))
    beta = jnp.zeros((32,))
    y = group_norm_silu(
        x, gamma, beta, groups=8, out_dtype=jnp.bfloat16, interpret=True
    )
    assert y.dtype == jnp.bfloat16
    want = _xla_group_norm_silu(x, gamma, beta, 8, 1e-6, True, jnp.bfloat16)
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(want, np.float32), atol=3e-2
    )


def test_remat_composes():
    """jax.checkpoint over the custom-vjp op must trace and differentiate."""
    shape, groups = (2, 4, 4, 32), 8
    x = _rand(jax.random.PRNGKey(4), shape)
    gamma = jnp.ones((32,))
    beta = jnp.zeros((32,))

    @jax.checkpoint
    def f(x):
        return jnp.sum(group_norm_silu(x, gamma, beta, groups=groups, interpret=True))

    g = jax.grad(f)(x)
    want = jax.grad(
        lambda x: jnp.sum(_xla_group_norm_silu(x, gamma, beta, groups, 1e-6, True, x.dtype))
    )(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), atol=3e-5)
