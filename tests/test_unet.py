"""U-Net architecture tests: shapes, conditioning, pruning overrides."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import UNetSpec, get_config
from group_attribution_for_diffusion_models_tpu.models import UNet2D

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _init_and_apply(spec, shape, cond=None):
    model = UNet2D(spec)
    x = jnp.zeros(shape)
    t = jnp.zeros((shape[0],), jnp.int32)
    args = (x, t) + ((cond,) if cond is not None else ())
    params = model.init(jax.random.PRNGKey(0), *args)["params"]
    out = model.apply({"params": params}, *args)
    return model, params, out


def test_tiny_unet_shape():
    _, _, out = _init_and_apply(TINY, (2, 8, 8, 3))
    assert out.shape == (2, 8, 8, 3)
    assert jnp.isfinite(out).all()


def test_cifar_unet_param_count():
    """CIFAR UNet2DModel has ~35.7M params in the reference architecture."""
    cfg = get_config("cifar")
    model = UNet2D(cfg.unet)
    x = jnp.zeros((1, 32, 32, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    n = sum(p.size for p in jax.tree_util.tree_leaves(params))
    # diffusers UNet2DModel with this config: 35,746,307 params.
    assert 30e6 < n < 42e6, n


def test_timestep_dependence():
    model, params, _ = _init_and_apply(TINY, (1, 8, 8, 3))
    x = jnp.ones((1, 8, 8, 3))
    o1 = model.apply({"params": params}, x, jnp.array([0]))
    o2 = model.apply({"params": params}, x, jnp.array([999]))
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_conditional_unet():
    spec = UNetSpec(
        sample_size=8,
        in_channels=4,
        out_channels=4,
        block_out_channels=(8, 16),
        down_block_types=("CrossAttnDownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "CrossAttnUpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
        attention_head_dim=2,
        cross_attention_dim=16,
    )
    cond = jnp.ones((2, 7, 16))
    _, params, out = _init_and_apply(spec, (2, 8, 8, 4), cond)
    assert out.shape == (2, 8, 8, 4)

    # Output must actually depend on the conditioning.
    model = UNet2D(spec)
    x = jnp.ones((2, 8, 8, 4))
    t = jnp.zeros((2,), jnp.int32)
    o1 = model.apply({"params": params}, x, t, cond)
    o2 = model.apply({"params": params}, x, t, 2.0 * cond)
    assert float(jnp.abs(o1 - o2).max()) > 1e-6


def test_pruned_channels_override():
    """Pruning shrinks a resnet's hidden width; interface shapes unchanged."""
    pruned = UNetSpec(
        **{
            **{f.name: getattr(TINY, f.name) for f in TINY.__dataclass_fields__.values()},
            "pruned_channels": {"down_0_res_0": 4, "mid_res_0": 8},
        }
    )
    model = UNet2D(pruned)
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]
    assert params["down_0_res_0"]["conv1"]["kernel"].shape[-1] == 4
    assert params["down_0_res_0"]["conv2"]["kernel"].shape[-2] == 4
    assert params["mid_res_0"]["conv1"]["kernel"].shape[-1] == 8
    out = model.apply({"params": params}, x, t)
    assert out.shape == (1, 8, 8, 3)

    # Pruned model has strictly fewer params.
    base_params = UNet2D(TINY).init(jax.random.PRNGKey(0), x, t)["params"]
    n_base = sum(p.size for p in jax.tree_util.tree_leaves(base_params))
    n_pruned = sum(p.size for p in jax.tree_util.tree_leaves(params))
    assert n_pruned < n_base


def test_jit_compiles_once():
    model, params, _ = _init_and_apply(TINY, (2, 8, 8, 3))
    fn = jax.jit(lambda p, x, t: model.apply({"params": p}, x, t))
    x = jnp.ones((2, 8, 8, 3))
    out = fn(params, x, jnp.array([5, 5]))
    assert out.shape == (2, 8, 8, 3)


@pytest.mark.parametrize("policy", [None, "convs", "convs_dots"])
def test_remat_policy_grads_match(policy):
    """Selective remat changes what the backward saves, never its value:
    gradients must be identical to the no-remat model."""
    model_ref = UNet2D(TINY)
    model_remat = UNet2D(TINY, remat=True, remat_policy=policy)
    x = jnp.linspace(-1, 1, 2 * 8 * 8 * 3).reshape(2, 8, 8, 3)
    t = jnp.array([3, 7])
    params = model_ref.init(jax.random.PRNGKey(0), x, t)["params"]

    def loss(m):
        return lambda p: jnp.mean(m.apply({"params": p}, x, t) ** 2)

    g_ref = jax.grad(loss(model_ref))(params)
    g_remat = jax.grad(loss(model_remat))(params)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_remat = jax.tree_util.tree_leaves(g_remat)
    assert len(flat_ref) == len(flat_remat)
    for a, b in zip(flat_ref, flat_remat):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_remat_policy_unknown_raises():
    model = UNet2D(TINY, remat=True, remat_policy="bogus")
    x = jnp.zeros((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    with pytest.raises(ValueError, match="remat_policy"):
        model.init(jax.random.PRNGKey(0), x, t)
