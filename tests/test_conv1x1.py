"""Conv1x1 mixed lowering: conv forward, matmul backward.

The default "mixed" lane (models/layers.py::_conv1x1_mixed) must match the
plain conv lowering bit-for-bit in the forward (it IS the same conv) and to
numerical tolerance in the gradients (the backward is re-expressed as
einsums — the contraction is identical, only the lowering differs). Checked
both unbatched and under the ensemble vmap with a per-member kernel, which
is exactly the case the matmul backward exists for (the grouped-conv dgrad
runs at ~20 TFLOP/s on v5e; docs/profile_cifar_train.txt).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.models.layers import (
    _conv1x1_mixed,
)


def _plain(x, kernel):
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_conv(dtype):
    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.random.normal(k1, (4, 8, 8, 6), dtype)
    w = jax.random.normal(k2, (1, 1, 6, 10), dtype)
    np.testing.assert_array_equal(
        np.asarray(_conv1x1_mixed(x, w)), np.asarray(_plain(x, w))
    )


def test_gradients_match_conv():
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(1), 3)
    x = jax.random.normal(k1, (4, 8, 8, 6), jnp.float32)
    w = jax.random.normal(k2, (1, 1, 6, 10), jnp.float32)
    ct = jax.random.normal(k3, (4, 8, 8, 10), jnp.float32)

    def loss(fn, x, w):
        return jnp.sum(fn(x, w) * ct)

    gx_m, gw_m = jax.grad(loss, argnums=(1, 2))(_conv1x1_mixed, x, w)
    gx_p, gw_p = jax.grad(loss, argnums=(1, 2))(_plain, x, w)
    np.testing.assert_allclose(gx_m, gx_p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gw_m, gw_p, rtol=1e-5, atol=1e-5)


def test_gradients_match_under_member_vmap():
    members = 3
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(2), 3)
    x = jax.random.normal(k1, (members, 4, 8, 8, 6), jnp.float32)
    w = jax.random.normal(k2, (members, 1, 1, 6, 10), jnp.float32)
    ct = jax.random.normal(k3, (members, 4, 8, 8, 10), jnp.float32)

    def member_loss(fn):
        def f(x, w, ct):
            return jnp.sum(fn(x, w) * ct)

        return jax.vmap(jax.grad(f, argnums=(0, 1)))

    gx_m, gw_m = member_loss(_conv1x1_mixed)(x, w, ct)
    gx_p, gw_p = member_loss(_plain)(x, w, ct)
    np.testing.assert_allclose(gx_m, gx_p, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(gw_m, gw_p, rtol=1e-5, atol=1e-5)
