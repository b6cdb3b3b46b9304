"""LoRA transform tests: zero-init, merge, training, rank pruning."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.models.lora import (
    lora_init,
    lora_merge,
    lora_num_params,
    lora_ranks,
    prune_lora,
    rank_pair_importance,
)

ATTN_SPEC = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _params():
    model = UNet2D(ATTN_SPEC)
    return model, model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]


def test_lora_targets_attention_projections():
    _, params = _params()
    tree = lora_init(params, rank=4)
    assert tree  # found q/k/v/out projections
    for name in tree:
        assert name.split("/")[-1] in ("to_q", "to_k", "to_v", "to_out")
    assert set(lora_ranks(tree).values()) == {4}


def test_lora_zero_init_is_identity():
    model, params = _params()
    tree = lora_init(params, rank=4)
    merged = lora_merge(params, tree)
    x = jnp.ones((1, 8, 8, 3))
    t = jnp.zeros((1,), jnp.int32)
    o1 = model.apply({"params": params}, x, t)
    o2 = model.apply({"params": merged}, x, t)
    np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), atol=1e-7)


def test_lora_training_moves_output():
    """Gradients flow through the merge into LoRA leaves only."""
    model, params = _params()
    tree = lora_init(params, rank=4, key=jax.random.PRNGKey(1))
    schedule = make_schedule(SchedulerSpec())
    x = jax.random.uniform(jax.random.PRNGKey(2), (4, 8, 8, 3), minval=-1, maxval=1)
    noise = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    t = jnp.array([10, 200, 500, 900])

    from group_attribution_for_diffusion_models_tpu.diffusion import add_noise

    def loss_fn(lora):
        merged = lora_merge(params, lora)
        x_t = add_noise(schedule, x, noise, t)
        eps = model.apply({"params": merged}, x_t, t)
        return jnp.mean((eps - noise) ** 2)

    g = jax.grad(loss_fn)(tree)
    # up starts at zero but receives nonzero gradient (down is random).
    up_gnorm = sum(float(jnp.abs(ab["up"]).sum()) for ab in g.values())
    assert up_gnorm > 0

    # One SGD step changes the merged model's output.
    tree2 = jax.tree_util.tree_map(lambda a, b: a - 1e-1 * b, tree, g)
    o1 = model.apply({"params": lora_merge(params, tree)}, x, t)
    o2 = model.apply({"params": lora_merge(params, tree2)}, x, t)
    assert float(jnp.abs(o1 - o2).max()) > 1e-8


def test_prune_lora_heterogeneous_ranks():
    _, params = _params()
    tree = lora_init(params, rank=8, key=jax.random.PRNGKey(4))
    # Give pairs nonzero magnitudes so importance ordering is meaningful.
    tree = jax.tree_util.tree_map(
        lambda a: a + 0.01 * jax.random.normal(jax.random.PRNGKey(5), a.shape), tree
    )
    before = lora_num_params(tree)
    pruned = prune_lora(tree, pruning_ratio=0.5)
    after = lora_num_params(pruned)
    assert after <= before * 0.55
    ranks = lora_ranks(pruned)
    assert min(ranks.values()) >= 1
    # Pruning is per-pair global: ranks need not stay uniform.
    for name, ab in pruned.items():
        assert ab["down"].shape[1] == ab["up"].shape[0]


def test_prune_lora_keeps_top_pairs():
    _, params = _params()
    tree = lora_init(params, rank=4, key=jax.random.PRNGKey(6))
    name = next(iter(tree))
    # Make pair 2 dominant in one layer.
    down = np.zeros_like(np.asarray(tree[name]["down"]))
    up = np.zeros_like(np.asarray(tree[name]["up"]))
    down[:, 2] = 10.0
    up[2, :] = 10.0
    down[:, 0] = 0.1
    up[0, :] = 0.1
    tree[name] = {"down": jnp.asarray(down), "up": jnp.asarray(up)}
    imp = rank_pair_importance(tree)
    assert imp[name].argmax() == 2

    pruned = prune_lora(tree, pruning_ratio=0.7, min_rank=1)
    # The dominant pair survives in that layer.
    kept_down = np.asarray(pruned[name]["down"])
    assert (np.abs(kept_down) > 1.0).any()


def test_lora_side_branch_matches_merge():
    """apply({"params", "lora"}) == apply with lora_merge'd params, for both
    forward values and LoRA gradients — the side branch is what lets big
    ensembles avoid per-member merged parameter copies."""
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        lora_collection,
    )

    model, params = _params()
    tree = lora_init(params, rank=4, key=jax.random.PRNGKey(7))
    # Nonzero up so the branch actually contributes.
    tree = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(jax.random.PRNGKey(8), a.shape),
        tree,
    )
    x = jax.random.uniform(jax.random.PRNGKey(9), (2, 8, 8, 3), minval=-1, maxval=1)
    t = jnp.array([7, 430])

    o_merge = model.apply({"params": lora_merge(params, tree)}, x, t)
    o_branch = model.apply(
        {"params": params, "lora": lora_collection(tree)}, x, t
    )
    np.testing.assert_allclose(
        np.asarray(o_merge), np.asarray(o_branch), atol=1e-5
    )

    def loss_merge(lo):
        return jnp.sum(model.apply({"params": lora_merge(params, lo)}, x, t) ** 2)

    def loss_branch(lo):
        return jnp.sum(
            model.apply({"params": params, "lora": lora_collection(lo)}, x, t) ** 2
        )

    g1 = jax.grad(loss_merge)(tree)
    g2 = jax.grad(loss_branch)(tree)
    for name in tree:
        for leaf in ("down", "up"):
            np.testing.assert_allclose(
                np.asarray(g1[name][leaf]),
                np.asarray(g2[name][leaf]),
                atol=5e-4,
                rtol=1e-3,
            )
