"""Train-state pytree and EMA polyak update.

The whole training state — params, EMA shadow, optimizer state, step — is one
pytree (SURVEY.md §7 layer 1), so it jits, shards over a mesh, stacks along
the ensemble axis, and checkpoints via orbax without special cases.

EMA semantics match diffusers EMAModel with use_ema_warmup=False as the
reference constructs it (reference unconditional_generation/main.py:341-424,
decay=0.9999, inv_gamma=1.0, power=3/4): per-step decay is
min(max_decay, (1+step)/(10+step)) — so early steps track the model fast.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct


@struct.dataclass
class TrainState:
    params: Any
    ema_params: Any
    opt_state: Any
    step: jnp.ndarray  # scalar int32

    @classmethod
    def create(cls, params, tx: optax.GradientTransformation) -> "TrainState":
        return cls(
            params=params,
            ema_params=jax.tree_util.tree_map(jnp.array, params),
            opt_state=tx.init(params),
            step=jnp.zeros((), jnp.int32),
        )


def ema_decay_schedule(
    step: jnp.ndarray,
    max_decay: float = 0.9999,
    use_warmup: bool = False,
    inv_gamma: float = 1.0,
    power: float = 0.75,
) -> jnp.ndarray:
    """Per-step EMA decay (diffusers EMAModel.get_decay)."""
    step_f = jnp.maximum(step.astype(jnp.float32), 0.0)
    if use_warmup:
        decay = 1.0 - (1.0 + step_f / inv_gamma) ** -power
    else:
        decay = (1.0 + step_f) / (10.0 + step_f)
    return jnp.clip(decay, 0.0, max_decay)


def ema_update(ema_params, params, decay: jnp.ndarray):
    """Polyak update ema <- ema - (1-decay) (ema - params), elementwise pytree."""
    return jax.tree_util.tree_map(
        lambda e, p: e - (1.0 - decay) * (e - p), ema_params, params
    )


def make_optimizer(
    name: str = "adam",
    lr: float = 1e-4,
    weight_decay: float = 0.0,
    grad_clip_norm: Optional[float] = 1.0,
    lr_schedule: str = "constant",
    total_steps: int = 0,
    warmup_steps: int = 0,
    maximize: bool = False,
    flat: bool = False,
) -> optax.GradientTransformation:
    """Build the optax chain: clip -> adam/adamw [-> ascent for unlearning].

    `maximize=True` implements gradient-ascent unlearning (the reference
    flips the loss sign, reference unconditional_generation/main.py:710-711);
    here it is an optimizer property so the same compiled loss serves both.
    """
    if lr_schedule == "constant":
        sched = optax.constant_schedule(lr)
        if warmup_steps:
            sched = optax.linear_schedule(0.0, lr, warmup_steps)
    elif lr_schedule == "cosine":
        sched = optax.warmup_cosine_decay_schedule(
            init_value=0.0 if warmup_steps else lr,
            peak_value=lr,
            warmup_steps=warmup_steps,
            decay_steps=max(total_steps, 1),
        )
    else:
        raise ValueError(f"unknown lr_schedule {lr_schedule!r}")

    parts = []
    if grad_clip_norm is not None:
        parts.append(optax.clip_by_global_norm(grad_clip_norm))
    if maximize:
        parts.append(optax.scale(-1.0))
    if name == "adam":
        parts.append(optax.adam(sched))
    elif name == "adamw":
        parts.append(optax.adamw(sched, weight_decay=weight_decay))
    elif name == "adafactor":
        # Memory-reduced optimizer slot: the TPU answer to the reference's
        # bitsandbytes Adam8bit recipe for 256^2 LDM training (reference
        # unconditional_generation/main.py:562-588; SURVEY.md §2.6) —
        # factored second moments instead of int8-quantized full state.
        parts.append(optax.adafactor(sched))
    elif name == "adam8bit":
        # Blockwise-int8 moment storage (direct bitsandbytes parity).
        from .quantized import adam8bit

        parts.append(adam8bit(sched))
    else:
        raise ValueError(f"unknown optimizer {name!r}")
    tx = optax.chain(*parts)
    if flat:
        # Run the whole chain on ONE concatenated parameter vector. The
        # per-leaf form launches a handful of tiny fused kernels per leaf
        # per step (global-norm partial, moment update, absmax requant) —
        # ~130 leaves x ~5 kernels on the CIFAR U-Net, and kernel-launch
        # overhead, not HBM traffic, dominates (docs/profile_cifar_train.txt:
        # multiply_reduce_fusion 4.9% / convert_reduce_fusion 9.3% on the SD
        # step). Flattened, the update is a few large fusions whose cost is
        # the irreducible state read/write. Quantized-optimizer block
        # boundaries stop aligning with leaf boundaries, which only changes
        # quantization noise, not semantics.
        tx = optax.flatten(tx)
    return tx
