"""8-bit-state Adam vs full-precision Adam: trajectory and memory checks."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from group_attribution_for_diffusion_models_tpu.training import make_optimizer
from group_attribution_for_diffusion_models_tpu.training.quantized import (
    BLOCK,
    _dequantize,
    _quantize,
    adam8bit,
)


def test_quantize_roundtrip_accuracy():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.normal(size=(3000,)).astype(np.float32) * 5.0)
    q, s = _quantize(x)
    back = _dequantize(q, s, x.shape)
    # Blockwise absmax int8: error bounded by scale/2 per element.
    max_scale = float(s.max())
    assert float(jnp.abs(back - x).max()) <= max_scale * 0.5 + 1e-6
    # Relative error small for typical magnitudes.
    assert float(jnp.abs(back - x).mean()) < 0.05


def test_quantize_handles_zeros_and_shapes():
    q, s = _quantize(jnp.zeros((10, 7)))
    back = _dequantize(q, s, (10, 7))
    np.testing.assert_array_equal(np.asarray(back), np.zeros((10, 7)))


def test_adam8bit_tracks_adam():
    """On a quadratic, int8-state Adam follows fp32 Adam closely."""
    rng = np.random.RandomState(1)
    target = jnp.asarray(rng.normal(size=(257,)).astype(np.float32))

    def loss(p):
        return jnp.sum((p - target) ** 2)

    p_full = jnp.zeros(257)
    p_q = jnp.zeros(257)
    tx_full = optax.adam(1e-1)
    tx_q = adam8bit(1e-1)
    s_full = tx_full.init(p_full)
    s_q = tx_q.init(p_q)

    @jax.jit
    def step(p, s, tx_update):
        g = jax.grad(loss)(p)
        return g

    for i in range(60):
        g = jax.grad(loss)(p_full)
        u, s_full = tx_full.update(g, s_full, p_full)
        p_full = optax.apply_updates(p_full, u)
        g = jax.grad(loss)(p_q)
        u, s_q = tx_q.update(g, s_q, p_q)
        p_q = optax.apply_updates(p_q, u)

    # Both converge toward the target; trajectories stay close.
    assert float(loss(p_q)) < 0.05 * float(jnp.sum(target**2))
    assert float(jnp.abs(p_q - p_full).max()) < 0.2


def test_adam8bit_state_is_int8():
    tx = adam8bit(1e-3)
    params = {"w": jnp.ones((5000,)), "b": jnp.ones((3,))}
    state = tx.init(params)
    assert state.mu["w"].q.dtype == jnp.int8
    assert state.nu["w"].q.dtype == jnp.int8
    # State bytes ~ n (int8 m) + n (int8 v) + scales — ~4x less than fp32 m+v.
    n = 5000
    q_bytes = 2 * n + 2 * 4 * (-(-n // BLOCK))
    fp_bytes = 2 * 4 * n
    assert q_bytes < fp_bytes / 3


def test_make_optimizer_adam8bit_trains():
    from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
    from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.training import (
        TrainState,
        make_train_step,
    )

    spec = SchedulerSpec()
    tiny = UNetSpec(
        sample_size=8, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4,
    )
    model = UNet2D(tiny)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    tx = make_optimizer("adam8bit", lr=1e-3)
    state = TrainState.create(params, tx)
    step = jax.jit(make_train_step(model.apply, tx, make_schedule(spec), spec))
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, 8, 8, 3), minval=-1, maxval=1)
    losses = []
    for i in range(15):
        state, m = step(state, imgs, jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
