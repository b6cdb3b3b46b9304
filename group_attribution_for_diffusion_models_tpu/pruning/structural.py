"""Structural channel pruning as a (UNetSpec, params) -> (UNetSpec, params) transform.

The reference prunes with torch_pruning graph surgery and pickles the whole
mutated nn.Module (reference unconditional_generation/prune.py:193-452,
415-421). TPU-native pruning is instead an explicit shape transformation:
importance-score each resnet block's hidden channels, keep the top
(1 - ratio) fraction, slice the corresponding parameter rows/columns, and
record the new widths in `UNetSpec.pruned_channels` — the pruned model
re-instantiates dense-smaller from config + params (SURVEY.md §5.4), and its
matmuls hit the MXU at the reduced width with no masking.

The prunable group per resnet block is the hidden width between conv1 and
conv2: slicing it updates conv1 (out), time_emb_proj (out), norm2
(scale/bias), and conv2 (in) coherently — the same dependency group
torch_pruning discovers from the torch graph.

Importance criteria (reference prune.py:320-398):
* magnitude — L2 norm of each hidden channel's weights;
* taylor / diff-pruning — |grad x weight| accumulated over diffusion
  timesteps 0..T-1 with early stop once the per-timestep loss exceeds a
  threshold fraction of the max (reference prune.py:358-378);
* random — seeded random scores (ablation baseline).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Dict, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import UNetSpec
from ..diffusion.schedulers import ScheduleState, add_noise


def resnet_block_paths(params: Mapping) -> Tuple[str, ...]:
    """All resnet-block module names in a UNet2D param tree."""
    return tuple(
        name
        for name in params
        if "conv1" in params[name] and "conv2" in params[name]
    )


def magnitude_importance(params: Mapping) -> Dict[str, np.ndarray]:
    """Per-hidden-channel L2 norm over conv1-out + conv2-in weights."""
    scores = {}
    for path in resnet_block_paths(params):
        block = params[path]
        w1 = np.asarray(block["conv1"]["kernel"])  # (kh, kw, in, hidden)
        w2 = np.asarray(block["conv2"]["kernel"])  # (kh, kw, hidden, out)
        s1 = np.sqrt((w1**2).sum(axis=(0, 1, 2)))
        s2 = np.sqrt((w2**2).sum(axis=(0, 1, 3)))
        scores[path] = s1 + s2
    return scores


def random_importance(params: Mapping, seed: int = 0) -> Dict[str, np.ndarray]:
    rng = np.random.RandomState(seed)
    return {
        path: rng.rand(params[path]["conv1"]["kernel"].shape[-1])
        for path in resnet_block_paths(params)
    }


def taylor_importance(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    images: np.ndarray,
    num_timesteps: int = 1000,
    timestep_stride: int = 1,
    loss_threshold: Optional[float] = None,
    seed: int = 0,
    batch_size: int = 64,
) -> Dict[str, np.ndarray]:
    """|grad x weight| per hidden channel, accumulated over timesteps.

    Mirrors the diff-pruning accumulation (reference prune.py:358-378): walk
    timesteps from T-1 down, accumulate first-order Taylor scores, stop early
    once loss(t) < loss_threshold * max-loss-so-far (diff-pruning criterion).
    """
    images = jnp.asarray(images[:batch_size])
    key = jax.random.PRNGKey(seed)

    @jax.jit
    def loss_and_grads(params, t_scalar, key):
        noise = jax.random.normal(key, images.shape)
        t = jnp.full((images.shape[0],), t_scalar, jnp.int32)

        def loss_fn(p):
            x_t = add_noise(schedule, images, noise, t)
            eps = apply_fn({"params": p}, x_t, t)
            return jnp.mean((eps - noise) ** 2)

        return jax.value_and_grad(loss_fn)(params)

    acc: Dict[str, np.ndarray] = {}
    max_loss = 0.0
    for t in range(num_timesteps - 1, -1, -timestep_stride):
        key, sub = jax.random.split(key)
        loss, grads = loss_and_grads(params, t, sub)
        loss = float(loss)
        max_loss = max(max_loss, loss)
        if loss_threshold is not None and loss < loss_threshold * max_loss:
            break
        for path in resnet_block_paths(params):
            g1 = np.asarray(grads[path]["conv1"]["kernel"])
            w1 = np.asarray(params[path]["conv1"]["kernel"])
            g2 = np.asarray(grads[path]["conv2"]["kernel"])
            w2 = np.asarray(params[path]["conv2"]["kernel"])
            s = np.abs(g1 * w1).sum(axis=(0, 1, 2)) + np.abs(g2 * w2).sum(
                axis=(0, 1, 3)
            )
            acc[path] = acc.get(path, 0.0) + s
    return acc


def _slice_block(block: Mapping, keep: np.ndarray) -> Dict:
    """Slice one resnet block's params to the kept hidden channels."""
    new = jax.tree_util.tree_map(np.asarray, dict(block))
    new["conv1"] = dict(block["conv1"])
    new["conv1"]["kernel"] = np.asarray(block["conv1"]["kernel"])[..., keep]
    new["conv1"]["bias"] = np.asarray(block["conv1"]["bias"])[keep]
    new["time_emb_proj"] = dict(block["time_emb_proj"])
    new["time_emb_proj"]["kernel"] = np.asarray(block["time_emb_proj"]["kernel"])[
        :, keep
    ]
    new["time_emb_proj"]["bias"] = np.asarray(block["time_emb_proj"]["bias"])[keep]
    new["norm2"] = dict(block["norm2"])
    new["norm2"]["scale"] = np.asarray(block["norm2"]["scale"])[keep]
    new["norm2"]["bias"] = np.asarray(block["norm2"]["bias"])[keep]
    new["conv2"] = dict(block["conv2"])
    new["conv2"]["kernel"] = np.asarray(block["conv2"]["kernel"])[:, :, keep, :]
    return new


def prune_unet(
    spec: UNetSpec,
    params,
    pruning_ratio: float,
    importance: Mapping[str, np.ndarray],
    group_size: Optional[int] = None,
) -> Tuple[UNetSpec, Dict]:
    """Keep the top (1 - ratio) hidden channels per resnet block.

    Kept widths round up to `group_size` (defaults to spec.norm_num_groups:
    GroupNorm divisibility, which also gives TPU-friendly widths). Returns
    the new spec (with pruned_channels) and sliced params.
    """
    if not 0.0 <= pruning_ratio < 1.0:
        raise ValueError(f"pruning_ratio must be in [0, 1), got {pruning_ratio}")
    if group_size is None:
        group_size = spec.norm_num_groups
    params = jax.tree_util.tree_map(np.asarray, params)
    new_params = dict(params)
    pruned_channels = dict(spec.pruned_channels or {})
    for path in resnet_block_paths(params):
        scores = np.asarray(importance[path])
        hidden = len(scores)
        n_keep = max(int(round(hidden * (1.0 - pruning_ratio))), group_size)
        n_keep = min(int(-(-n_keep // group_size) * group_size), hidden)
        keep = np.sort(np.argsort(scores)[::-1][:n_keep])
        new_params[path] = _slice_block(params[path], keep)
        if n_keep != hidden:
            pruned_channels[path] = n_keep
    new_spec = dataclasses.replace(spec, pruned_channels=pruned_channels)
    return new_spec, new_params


def count_params(params) -> int:
    return int(sum(np.asarray(p).size for p in jax.tree_util.tree_leaves(params)))
