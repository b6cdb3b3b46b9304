"""WoodFisher influence unlearning (iu/iu_u methods).

Re-design of reference src/unlearn/Wfisher.py:12-207: approximate the inverse
Hessian by the WoodFisher rank-1 recursion over per-batch gradients and
perturb parameters by alpha * H^-1 (g_removed - g_remaining)-direction.

* `average_gradient` — the flat mean gradient over a dataset with antithetic
  timesteps (reference get_grad :37-122), computed as one jitted scan over
  batches; parameters stay a pytree until the final ravel.
* `woodfisher_inv_hvp` — the inherently sequential rank-1 recursion

      o_{k+1} = o_k - (o_k . g_k) / (N + g_k . o_k_tmp) * k_k ...

  expressed as `lax.scan` whose carry is the flat vector o (SURVEY.md §7
  "hard parts": this will not vectorize across the ensemble cheaply, so it
  runs per-model); per-batch gradients are computed inside the scan body, so
  the (N, D) gradient matrix never materializes.
* `apply_perturbation` — params + alpha * delta (reference apply_perturb
  :12-21).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config.registry import SchedulerSpec
from ..diffusion.schedulers import ScheduleState, add_noise, antithetic_timesteps


def _flatten(tree):
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    flat = jnp.concatenate([jnp.ravel(l) for l in leaves])
    shapes = [l.shape for l in leaves]
    sizes = [int(np.prod(s)) for s in shapes]
    return flat, (treedef, shapes, sizes)


def _unflatten(flat, meta):
    treedef, shapes, sizes = meta
    parts = []
    offset = 0
    for shape, size in zip(shapes, sizes):
        parts.append(flat[offset : offset + size].reshape(shape))
        offset += size
    return jax.tree_util.tree_unflatten(treedef, parts)


def _batch_grad_fn(apply_fn: Callable, schedule: ScheduleState, spec: SchedulerSpec):
    def grad_fn(params, images, key):
        k_t, k_n = jax.random.split(key)
        t = antithetic_timesteps(k_t, images.shape[0], spec.num_train_timesteps)
        noise = jax.random.normal(k_n, images.shape)

        def loss_fn(p):
            x_t = add_noise(schedule, images, noise, t)
            eps = apply_fn({"params": p}, x_t, t)
            return jnp.mean((eps - noise) ** 2)

        return jax.grad(loss_fn)(params)

    return grad_fn


def average_gradient(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    images: np.ndarray,
    batch_size: int = 64,
    seed: int = 0,
) -> jnp.ndarray:
    """Flat dataset-mean gradient (reference Wfisher.get_grad)."""
    grad_fn = jax.jit(_batch_grad_fn(apply_fn, schedule, spec))
    n = len(images)
    total = None
    count = 0
    key = jax.random.PRNGKey(seed)
    for i in range(0, n - n % batch_size or n, batch_size):
        batch = jnp.asarray(images[i : i + batch_size])
        if len(batch) == 0:
            break
        key, sub = jax.random.split(key)
        g = grad_fn(params, batch, sub)
        flat, meta = _flatten(g)
        w = len(batch)
        total = flat * w if total is None else total + flat * w
        count += w
    if total is None:
        raise ValueError("no data")
    return total / count


def woodfisher_inv_hvp(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    images: np.ndarray,
    vector: jnp.ndarray,
    num_batches: int = 32,
    batch_size: int = 8,
    damping: float = 1e-4,
    seed: int = 1,
) -> jnp.ndarray:
    """WoodFisher approximate H^-1 v via the sequential rank-1 recursion.

    Faithful to reference woodfisher_diff (Wfisher.py:195-205): with sample
    count N, per-batch flat gradients g_i, and k_vec initialized to v,

        i = 0:   o = g_0
        i > 0:   tmp = o . g_i
                 k_vec -= (k_vec . g_i) / (N + tmp) * o
                 o     -= (tmp / (N + tmp)) * o

    returning k_vec. Implemented as lax.scan whose carry is (k_vec, o) and
    whose body computes the batch gradient in place — O(D) memory, never an
    (N, D) matrix.
    """
    n_avail = len(images) // batch_size
    num_batches = min(num_batches, n_avail)
    if num_batches < 1:
        raise ValueError("not enough data for woodfisher batches")
    batches = jnp.asarray(
        images[: num_batches * batch_size].reshape(
            num_batches, batch_size, *images.shape[1:]
        )
    )
    keys = jax.random.split(jax.random.PRNGKey(seed), num_batches)
    grad_fn = _batch_grad_fn(apply_fn, schedule, spec)
    n_f = float(len(images))

    @jax.jit
    def run(params, vector):
        def body(carry, inputs):
            k_vec, o, step = carry
            batch, key = inputs
            g, _ = _flatten(grad_fn(params, batch, key))

            tmp = jnp.dot(o, g)
            denom = n_f + tmp + damping
            k_next = k_vec - (jnp.dot(k_vec, g) / denom) * o
            o_next = o - (tmp / denom) * o
            is_first = step == 0
            k_out = jnp.where(is_first, k_vec, k_next)
            o_out = jnp.where(is_first, g, o_next)
            return (k_out, o_out, step + 1), None

        init = (vector, jnp.zeros_like(vector), jnp.zeros((), jnp.int32))
        (k_vec, _, _), _ = jax.lax.scan(body, init, (batches, keys))
        return k_vec

    return run(params, vector)


def apply_perturbation(params, flat_delta: jnp.ndarray, alpha: float = 1.0):
    """params + alpha * unflatten(delta) (reference apply_perturb)."""
    _, meta = _flatten(params)
    delta = _unflatten(flat_delta, meta)
    return jax.tree_util.tree_map(lambda p, d: p + alpha * d, params, delta)


def influence_unlearn(
    apply_fn: Callable,
    params,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    removed_images: np.ndarray,
    remaining_images: np.ndarray,
    alpha: float = 1.0,
    batch_size: int = 32,
    wf_batches: int = 16,
    seed: int = 0,
):
    """Full iu method (reference unlearn.py:509-546): perturb params by
    iu_ratio * WoodFisher^-1 applied to frac * (mean_forget - mean_retain),
    where frac = |removed| / |total| (the reference's weight normalization
    of the summed gradients)."""
    g_removed = average_gradient(
        apply_fn, params, schedule, spec, removed_images, batch_size, seed
    )
    g_remaining = average_gradient(
        apply_fn, params, schedule, spec, remaining_images, batch_size, seed + 1
    )
    frac = len(removed_images) / (len(removed_images) + len(remaining_images))
    direction = frac * (g_removed - g_remaining)
    inv_hvp = woodfisher_inv_hvp(
        apply_fn, params, schedule, spec, remaining_images, direction,
        num_batches=wf_batches, batch_size=max(batch_size // 4, 1), seed=seed + 2,
    )
    return apply_perturbation(params, inv_hvp, alpha)
