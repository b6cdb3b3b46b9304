"""TRAK / D-TRAK gradient features and score assembly.

Replaces reference src/attributions/methods/d_trak_grad.py (800 LoC of
torch.func vmap/grad with the SDPA-deletion hack + CudaProjector) and
compute_gradient_score.py:13-139. In JAX the per-sample gradient is just
`jax.vmap(jax.grad(f))` — it composes with the attention kernel, no hacks —
and the JL projection is the Pallas kernel in ops.jl_projection, fused right
after the gradient so the (B, n_params) matrix lives only as one batch tile.

Output functions f over the U-Net prediction (reference d_trak_grad.py
:591-724): 'loss' (the D-TRAK default mse vs true noise), 'mean',
'mean-squared-l2-norm', 'l1-norm', 'l2-norm', 'linf-norm'. Features average
over `num_timesteps` evenly spaced timesteps, with 'uniform' or 'cumulative'
t-strategies (reference :718-721).

Score assembly (reference compute_gradient_score.py:102-126):
    kernel   = (Phi^T Phi + lambda I)^-1
    trak     = Phi_train kernel Phi_gen^T
    relative-IF / renormalized-IF divide by per-row norms
    grad-sim = raw dot products
with class/group aggregation via attribution_utils.aggregate_by_class.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ...config.registry import SchedulerSpec
from ...diffusion.schedulers import ScheduleState, add_noise
from ...ops.jl_projection import jl_project

OUTPUT_FNS = (
    "loss",
    "mean",
    "mean-squared-l2-norm",
    "l1-norm",
    "l2-norm",
    "linf-norm",
)


def _output_fn(name: str) -> Callable[[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
    if name == "loss":
        return lambda eps, noise: jnp.mean((eps - noise) ** 2)
    if name == "mean":
        return lambda eps, noise: jnp.mean(eps)
    if name == "mean-squared-l2-norm":
        return lambda eps, noise: jnp.mean(eps**2)
    if name == "l1-norm":
        return lambda eps, noise: jnp.sum(jnp.abs(eps))
    if name == "l2-norm":
        return lambda eps, noise: jnp.sqrt(jnp.sum(eps**2))
    if name == "linf-norm":
        return lambda eps, noise: jnp.max(jnp.abs(eps))
    raise ValueError(f"unknown output fn {name!r}; choose from {OUTPUT_FNS}")


def feature_timesteps(
    num_train_timesteps: int, num_timesteps: int, strategy: str = "uniform"
) -> np.ndarray:
    """Timestep grid for feature averaging (reference d_trak_grad.py:718-721)."""
    if strategy == "uniform":
        return np.arange(0, num_train_timesteps, num_train_timesteps // num_timesteps)[
            :num_timesteps
        ]
    if strategy == "cumulative":
        return np.arange(num_timesteps)
    raise ValueError(f"unknown t_strategy {strategy!r}")


def make_grad_feature_fn(
    apply_fn: Callable,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    output_fn: str = "loss",
    proj_dim: int = 4096,
    num_timesteps: int = 10,
    t_strategy: str = "uniform",
    proj_seed: int = 0,
    params_filter: Optional[Callable] = None,
    conditional: bool = False,
    sketch_probe: Optional[dict] = None,
):
    """Build a jitted (params, images, key[, ehs]) -> (B, proj_dim) extractor.

    `params_filter` optionally maps the full param tree to the differentiated
    sub-tree (e.g. LoRA-only features, reference grad_text_to_image_lora.py);
    it must return (trainable_tree, merge_fn) where merge_fn(trainable) -> full
    params. With `conditional=True` the extractor takes per-sample
    encoder_hidden_states (B, 77, D) as a fourth argument (the SD text-to-
    image path, reference grad_text_to_image_lora.py:591-724).

    `sketch_probe` (a models.lora.probe_sketch_init tree; exclusive with
    params_filter) switches to Kronecker-probe gradient sketching: the model
    runs with the probe as a zero-output LoRA side branch and only the
    probe's `up` leaves are differentiated, so each per-sample "gradient" is
    already the k-row input-side sketch down^T @ grad_kernel per attention
    projection — the (B, n_params) per-sample gradient matrix (the memory
    wall: 143 MB/sample fp32 for the 35.7M CIFAR U-Net) never exists. For
    models that carry a trained LoRA, merge it first (models.lora.lora_merge)
    since the probe occupies the "lora" collection. Features are
    attention-projection-only in this mode (the reference's own choice for
    its SD path, grad_text_to_image_lora.py:776-820).
    """
    from ...models.lora import lora_collection

    if sketch_probe is not None and params_filter is not None:
        raise ValueError("sketch_probe and params_filter are exclusive")
    f = _output_fn(output_fn)
    ts = feature_timesteps(spec.num_train_timesteps, num_timesteps, t_strategy)
    ts_arr = jnp.asarray(ts)
    probe_downs = (
        {name: ab["down"] for name, ab in sketch_probe.items()}
        if sketch_probe is not None
        else None
    )
    probe_ups0 = (
        {name: ab["up"] for name, ab in sketch_probe.items()}
        if sketch_probe is not None
        else None
    )

    def per_sample_grad(params, image, noise, t, ehs=None):
        if sketch_probe is not None:

            def scalar_out(ups):
                tree = {
                    name: {"down": probe_downs[name], "up": ups[name]}
                    for name in ups
                }
                variables = {"params": params, "lora": lora_collection(tree)}
                x_t = add_noise(schedule, image[None], noise[None], t[None])
                if ehs is not None:
                    eps = apply_fn(variables, x_t, t[None], ehs[None])
                else:
                    eps = apply_fn(variables, x_t, t[None])
                return f(eps[0], noise[0])

            return jax.grad(scalar_out)(probe_ups0)

        if params_filter is not None:
            trainable, merge_fn = params_filter(params)
        else:
            trainable, merge_fn = params, lambda p: p

        def scalar_out(tr):
            p = merge_fn(tr)
            x_t = add_noise(schedule, image[None], noise[None], t[None])
            if ehs is not None:
                eps = apply_fn({"params": p}, x_t, t[None], ehs[None])
            else:
                eps = apply_fn({"params": p}, x_t, t[None])
            return f(eps[0], noise[0])

        return jax.grad(scalar_out)(trainable)

    in_axes = (None, 0, 0, 0, 0) if conditional else (None, 0, 0, 0)

    @jax.jit
    def features(params, images, key, encoder_hidden_states=None):
        b = images.shape[0]
        extra = (encoder_hidden_states,) if conditional else ()

        def for_timestep(carry, t_scalar):
            acc, key = carry
            key, k_n = jax.random.split(key)
            noise = jax.random.normal(k_n, images.shape)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            grads = jax.vmap(per_sample_grad, in_axes=in_axes)(
                params, images, noise, t_b, *extra
            )
            leaves = jax.tree_util.tree_leaves(grads)
            flat = jnp.concatenate([l.reshape(b, -1) for l in leaves], axis=1)
            return (acc + flat, key), None

        leaves_shape = jax.eval_shape(
            lambda: jax.vmap(per_sample_grad, in_axes=in_axes)(
                params, images, jnp.zeros_like(images), jnp.zeros((b,), jnp.int32),
                *extra
            )
        )
        dim = sum(
            int(np.prod(l.shape[1:])) for l in jax.tree_util.tree_leaves(leaves_shape)
        )
        acc0 = jnp.zeros((b, dim), jnp.float32)
        (acc, _), _ = jax.lax.scan(for_timestep, (acc0, key), ts_arr)
        flat = acc / float(len(ts))
        return jl_project(flat, proj_dim, seed=proj_seed)

    return features


def make_journey_feature_fn(
    apply_fn: Callable,
    schedule: ScheduleState,
    spec: SchedulerSpec,
    output_fn: str = "loss",
    proj_dim: int = 4096,
    proj_seed: int = 0,
    params_filter: Optional[Callable] = None,
    conditional: bool = False,
    sketch_probe: Optional[dict] = None,
):
    """Journey-TRAK features: gradients at latents captured along the actual
    sampling trajectory (reference d_trak_grad.py:450-494), instead of fresh
    q-sample noisings. Input: trajectory (T, B, ...) + timesteps (T,) from
    diffusion.sampling.sample_with_trajectory; output (B, proj_dim).
    `params_filter`/`conditional`/`sketch_probe` as in make_grad_feature_fn
    (the SD LoRA journey path, reference grad_text_to_image_lora.py:729-764)."""
    from ...models.lora import lora_collection

    if sketch_probe is not None and params_filter is not None:
        raise ValueError("sketch_probe and params_filter are exclusive")
    f = _output_fn(output_fn)
    probe_downs = (
        {name: ab["down"] for name, ab in sketch_probe.items()}
        if sketch_probe is not None
        else None
    )
    probe_ups0 = (
        {name: ab["up"] for name, ab in sketch_probe.items()}
        if sketch_probe is not None
        else None
    )

    def per_sample_grad(params, latent, noise, t, ehs=None):
        if sketch_probe is not None:

            def scalar_out(ups):
                tree = {
                    name: {"down": probe_downs[name], "up": ups[name]}
                    for name in ups
                }
                variables = {"params": params, "lora": lora_collection(tree)}
                if ehs is not None:
                    eps = apply_fn(variables, latent[None], t[None], ehs[None])
                else:
                    eps = apply_fn(variables, latent[None], t[None])
                return f(eps[0], noise[0])

            return jax.grad(scalar_out)(probe_ups0)

        if params_filter is not None:
            trainable, merge_fn = params_filter(params)
        else:
            trainable, merge_fn = params, lambda p: p

        def scalar_out(tr):
            p = merge_fn(tr)
            if ehs is not None:
                eps = apply_fn({"params": p}, latent[None], t[None], ehs[None])
            else:
                eps = apply_fn({"params": p}, latent[None], t[None])
            return f(eps[0], noise[0])

        return jax.grad(scalar_out)(trainable)

    in_axes = (None, 0, 0, 0, 0) if conditional else (None, 0, 0, 0)

    @jax.jit
    def features(params, trajectory, timesteps, key, encoder_hidden_states=None):
        t_steps, b = trajectory.shape[0], trajectory.shape[1]
        extra = (encoder_hidden_states,) if conditional else ()

        def for_point(carry, inputs):
            acc, key = carry
            latents, t_scalar = inputs
            key, k_n = jax.random.split(key)
            noise = jax.random.normal(k_n, latents.shape)
            t_b = jnp.full((b,), t_scalar, jnp.int32)
            grads = jax.vmap(per_sample_grad, in_axes=in_axes)(
                params, latents, noise, t_b, *extra
            )
            leaves = jax.tree_util.tree_leaves(grads)
            flat = jnp.concatenate([l.reshape(b, -1) for l in leaves], axis=1)
            return (acc + flat, key), None

        shape_probe = jax.eval_shape(
            lambda: jax.vmap(per_sample_grad, in_axes=in_axes)(
                params, trajectory[0], jnp.zeros_like(trajectory[0]),
                jnp.zeros((b,), jnp.int32), *extra
            )
        )
        dim = sum(
            int(np.prod(l.shape[1:]))
            for l in jax.tree_util.tree_leaves(shape_probe)
        )
        acc0 = jnp.zeros((b, dim), jnp.float32)
        (acc, _), _ = jax.lax.scan(for_point, (acc0, key), (trajectory, timesteps))
        return jl_project(acc / t_steps, proj_dim, seed=proj_seed)

    return features


def compute_gradient_scores(
    train_features: np.ndarray,
    gen_features: np.ndarray,
    method: str = "trak",
    lambda_reg: float = 5e-1,
) -> np.ndarray:
    """(n_train, n_gen) attribution scores from projected gradient features.

    Methods (reference compute_gradient_score.py:114-126):
      trak            Phi_t (Phi_t^T Phi_t + lam I)^-1 Phi_g^T
      relative_if     trak rows / ||kernel-weighted train row||
      renormalized_if trak rows / ||train row||
      grad_sim        Phi_t Phi_g^T (cosine on request)
    """
    phi_t = np.asarray(train_features, np.float64)
    phi_g = np.asarray(gen_features, np.float64)
    if method == "grad_sim":
        return phi_t @ phi_g.T

    d = phi_t.shape[1]
    kernel = phi_t.T @ phi_t + lambda_reg * np.eye(d)
    kernel_inv = np.linalg.inv(kernel)
    scores = phi_t @ kernel_inv @ phi_g.T
    if method == "trak":
        return scores
    if method == "relative_if":
        norms = np.linalg.norm(phi_t @ kernel_inv, axis=1, keepdims=True)
        return scores / np.maximum(norms, 1e-12)
    if method == "renormalized_if":
        norms = np.linalg.norm(phi_t, axis=1, keepdims=True)
        return scores / np.maximum(norms, 1e-12)
    raise ValueError(f"unknown method {method!r}")


def aggregate_by_group(
    scores: np.ndarray, group_labels: Sequence[int], mode: str = "sum"
) -> np.ndarray:
    """Collapse per-example scores (n_train, n_gen) to per-group attributions
    (reference attribution_utils.aggregate_by_class :15-48; sum/mean/max)."""
    labels = np.asarray(group_labels)
    groups = np.unique(labels)
    per_gen = scores.mean(axis=1)
    out = np.zeros(len(groups))
    for i, g in enumerate(groups):
        vals = per_gen[labels == g]
        if mode == "sum":
            out[i] = vals.sum()
        elif mode == "mean":
            out[i] = vals.mean()
        elif mode == "max":
            out[i] = vals.max()
        else:
            raise ValueError(f"unknown mode {mode!r}")
    return out
