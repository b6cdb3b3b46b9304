"""LoRA as a functional parameter transform with per-projection ranks.

The reference vendors 2,400 lines of diffusers attention_processor.py solely
so pruned LoRA with *different ranks per q/k/v/out projection* can serialize
(reference src/diffusers/models/attention_processor.py:37-125,1783-1910;
SURVEY.md §2.1). In JAX none of that machinery exists: LoRA is a separate
pytree {layer_path: {down: (in, r), up: (r, out)}} whose ranks are just leaf
shapes, and applying it is a pure merge

    W_eff = W + scale * down @ up

computed on the fly inside the train step. Gradients flow only through the
LoRA tree (jax.grad w.r.t. the lora argument), so "train LoRA only" needs no
parameter freezing plumbing. Rank pruning (prune_lora) slices (down-col,
up-row) pairs by magnitude — heterogeneous ranks fall out for free.

Targets: Dense kernels whose module name matches `target_patterns`
(to_q/to_k/to_v/to_out on attention blocks, matching the reference's LoRA
injection, reference text_to_image/train_text_to_image_lora.py:776-820).
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TARGETS = ("to_q", "to_k", "to_v", "to_out")


def _iter_dense_paths(params: Mapping, targets: Sequence[str], prefix=()) -> List[Tuple]:
    """Paths of Dense kernels whose leaf module name matches a target."""
    out = []
    for name, sub in params.items():
        if isinstance(sub, Mapping):
            if name in targets and "kernel" in sub and np.ndim(sub["kernel"]) == 2:
                out.append(prefix + (name,))
            else:
                out.extend(_iter_dense_paths(sub, targets, prefix + (name,)))
    return out


def _get(tree, path):
    for p in path:
        tree = tree[p]
    return tree


def _set(tree: Dict, path, value) -> Dict:
    """Functionally set a nested dict entry, copying along the path."""
    if len(path) == 1:
        new = dict(tree)
        new[path[0]] = value
        return new
    new = dict(tree)
    new[path[0]] = _set(tree[path[0]], path[1:], value)
    return new


def lora_path_name(path: Tuple) -> str:
    return "/".join(path)


def lora_init(
    params: Mapping,
    rank: int = 256,
    key: Optional[jax.Array] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
    scale: float = 1.0,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Zero-output init: down ~ N(0, 1/rank), up = 0 (standard LoRA init)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    tree: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path in _iter_dense_paths(params, targets):
        kernel = _get(params, path)["kernel"]
        d_in, d_out = kernel.shape
        r = min(rank, d_in, d_out)
        key, sub = jax.random.split(key)
        tree[lora_path_name(path)] = {
            "down": jax.random.normal(sub, (d_in, r)) / r,
            "up": jnp.zeros((r, d_out)),
        }
    return tree


def lora_merge(params, lora_tree: Mapping, scale: float = 1.0):
    """params + scale * down@up on each targeted kernel (pure).

    The delta is cast to the base kernel's dtype before the add: with a bf16
    base, a fp32 delta would silently upcast every merged kernel (an extra
    full parameter copy in HBM per ensemble member). The cast is
    differentiable, so LoRA gradients still flow in fp32.
    """
    new = params
    for name, ab in lora_tree.items():
        path = tuple(name.split("/"))
        leaf = _get(params, path)
        delta = (ab["down"] @ ab["up"]).astype(leaf["kernel"].dtype)
        new_leaf = dict(leaf)
        new_leaf["kernel"] = leaf["kernel"] + scale * delta
        new = _set(new, path, new_leaf)
    return new


def lora_collection(lora_tree: Mapping) -> Dict:
    """Flat LoRA tree -> nested "lora" variable collection for model.apply.

    model.apply({"params": base, "lora": lora_collection(lo)}, ...) runs the
    forward pass with LoRA as a side branch (models.layers.LoRADense) —
    numerically identical to applying lora_merge(base, lo) but without
    materializing the merged parameter copy, which is what makes large
    vmapped LoRA ensembles fit in HBM.
    """
    nested: Dict = {}
    for name, ab in lora_tree.items():
        node = nested
        parts = name.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = dict(ab)
    return nested


def probe_sketch_init(
    params: Mapping,
    k: int = 64,
    key: Optional[jax.Array] = None,
    targets: Sequence[str] = DEFAULT_TARGETS,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """LoRA-shaped tree for GRADIENT SKETCHING, not adaptation.

    down is a FIXED Rademacher matrix (in, k)/sqrt(k) — an input-side JL
    sketch; up = 0 keeps the forward pass bit-identical. Differentiating a
    loss wrt ONLY the up leaves yields, per layer, (x @ down)^T @ dL/dy =
    down^T @ grad_kernel — a k-row sketch of the dense kernel's gradient
    that autodiff computes WITHOUT ever materializing the (in, out)
    per-sample gradient (the memory wall of vmapped per-sample grads; same
    idea as LoGra-style low-rank gradient projection). Used by
    attributions.methods.trak.make_grad_feature_fn(sketch_probe=...).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    tree: Dict[str, Dict[str, jnp.ndarray]] = {}
    for path in _iter_dense_paths(params, targets):
        kernel = _get(params, path)["kernel"]
        d_in, d_out = kernel.shape
        kk = min(k, d_in)
        key, sub = jax.random.split(key)
        down = (
            jax.random.rademacher(sub, (d_in, kk), dtype=jnp.float32)
            / np.sqrt(kk)
        )
        tree[lora_path_name(path)] = {
            "down": down,
            "up": jnp.zeros((kk, d_out)),
        }
    return tree


def attention_params_filter(params: Mapping, targets: Sequence[str] = DEFAULT_TARGETS):
    """(trainable, merge_fn) restricting grads to attention-projection kernels.

    The params_filter contract of attributions.methods.trak.
    make_grad_feature_fn: EXACT per-sample gradients over the same kernels
    probe sketching sees (to_q/to_k/to_v/to_out, incl. biases) — the
    apples-to-apples baseline for the sketch, and the reference's own SD
    feature choice (grad_text_to_image_lora.py:776-820). Returns None when
    the architecture has no attention projections."""
    paths = _iter_dense_paths(params, targets)
    if not paths:
        return None

    def filter_fn(p):
        trainable = {lora_path_name(path): _get(p, path) for path in paths}

        def merge(tr):
            out = p
            for path in paths:
                out = _set(out, path, tr[lora_path_name(path)])
            return out

        return trainable, merge

    return filter_fn


def lora_ranks(lora_tree: Mapping) -> Dict[str, int]:
    return {name: int(ab["down"].shape[1]) for name, ab in lora_tree.items()}


def lora_num_params(lora_tree: Mapping) -> int:
    return int(
        sum(
            int(np.prod(ab["down"].shape)) + int(np.prod(ab["up"].shape))
            for ab in lora_tree.values()
        )
    )


def lora_plus_optimizer(
    lr: float,
    plus_ratio: float = 16.0,
    weight_decay: float = 0.0,
    lr_schedule: str = "constant",
    total_steps: int = 0,
):
    """LoRA+ optimizer: the up (B) matrices train at plus_ratio x the down
    (A) matrices' learning rate (Hayou et al. 2024), as the reference's LoRA
    unlearning path configures (reference unconditional_generation/
    unlearn.py:404-424). Returns an optax transformation over a LoRA tree.
    """
    import optax

    def make(lr_value):
        if lr_schedule == "cosine":
            sched = optax.cosine_decay_schedule(lr_value, max(total_steps, 1))
        else:
            sched = optax.constant_schedule(lr_value)
        return optax.adamw(sched, weight_decay=weight_decay)

    def label_fn(tree):
        return {
            name: {"down": "down", "up": "up"} for name in tree
        }

    return optax.multi_transform(
        {"down": make(lr), "up": make(lr * plus_ratio)}, label_fn
    )


def save_lora_safetensors(path: str, lora_tree: Mapping) -> None:
    """Serialize a LoRA tree as safetensors (the reference's LoRA weight
    format, pytorch_lora_weights.safetensors — reference
    train_text_to_image_lora.py:1366-1371). Keys: '<layer>::down'/'::up'."""
    import os

    from safetensors.numpy import save_file

    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    flat = {
        f"{name}::{leaf}": np.asarray(v)
        for name, ab in lora_tree.items()
        for leaf, v in ab.items()
    }
    save_file(flat, path)


def load_lora_safetensors(path: str) -> Dict[str, Dict[str, jnp.ndarray]]:
    from safetensors.numpy import load_file

    tree: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key, v in load_file(path).items():
        name, leaf = key.rsplit("::", 1)
        tree.setdefault(name, {})[leaf] = jnp.asarray(v)
    return tree


def rank_pair_importance(lora_tree: Mapping) -> Dict[str, np.ndarray]:
    """Magnitude importance of each rank-1 (down-col, up-row) pair.

    |down[:, r]| * |up[r, :]| — the score prune_lora greedily removes
    (reference text_to_image/prune_lora.py:122-141).
    """
    return {
        name: np.linalg.norm(np.asarray(ab["down"]), axis=0)
        * np.linalg.norm(np.asarray(ab["up"]), axis=1)
        for name, ab in lora_tree.items()
    }


def prune_lora(
    lora_tree: Mapping,
    pruning_ratio: float,
    min_rank: int = 1,
) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Globally remove the lowest-importance rank pairs until only
    (1 - ratio) of LoRA params remain (reference prune_lora.py:143-180).

    Ranks become heterogeneous across projections; each layer keeps at least
    `min_rank`.
    """
    if not 0.0 <= pruning_ratio < 1.0:
        raise ValueError(f"pruning_ratio must be in [0, 1), got {pruning_ratio}")
    imp = rank_pair_importance(lora_tree)
    # Global pool of (score, layer, rank_idx, cost).
    pool = []
    for name, scores in imp.items():
        d_in = lora_tree[name]["down"].shape[0]
        d_out = lora_tree[name]["up"].shape[1]
        cost = d_in + d_out  # params freed by removing one rank pair
        for r_idx, s in enumerate(scores):
            pool.append((float(s), name, r_idx, cost))
    pool.sort(key=lambda t: t[0])

    total = lora_num_params(lora_tree)
    target = total * (1.0 - pruning_ratio)
    remaining = total
    ranks_left = {name: len(s) for name, s in imp.items()}
    drop: Dict[str, set] = {name: set() for name in imp}
    for s, name, r_idx, cost in pool:
        if remaining <= target:
            break
        if ranks_left[name] <= min_rank:
            continue
        drop[name].add(r_idx)
        ranks_left[name] -= 1
        remaining -= cost

    pruned = {}
    for name, ab in lora_tree.items():
        keep = np.asarray(
            [r for r in range(ab["down"].shape[1]) if r not in drop[name]]
        )
        pruned[name] = {
            "down": jnp.asarray(np.asarray(ab["down"])[:, keep]),
            "up": jnp.asarray(np.asarray(ab["up"])[keep, :]),
        }
    return pruned
