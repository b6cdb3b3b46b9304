"""Attention dispatch: XLA fused attention now, Pallas flash kernel for hot shapes.

The reference needs three different attention code paths — PyTorch SDPA, the
xformers memory-efficient kernel, and an SDPA-deleted pure-python fallback so
torch.func.vmap can trace per-sample gradients (reference
text_to_image/grad_text_to_image_lora.py:21-22; SURVEY.md §2.6). On TPU one
path suffices: `jax.nn.dot_product_attention` lowers to fused XLA attention,
composes with jax.vmap/jax.grad (so TRAK per-sample gradients need no hack),
and `ops.flash_attention` provides a Pallas kernel for the larger LDM shapes.

All sequences in these workloads are short (<= 64*64 = 4096 latent tokens +
77 text tokens, SURVEY.md §5.7), so a single VMEM-resident block per head is
the common case.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Fused scaled dot-product attention on (B, S, H, D) tensors."""
    return jax.nn.dot_product_attention(q, k, v)
