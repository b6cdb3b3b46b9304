"""Attention dispatch: Pallas flash kernel for hot shapes, XLA fusion elsewhere.

The reference needs three different attention code paths — PyTorch SDPA, the
xformers memory-efficient kernel, and an SDPA-deleted pure-python fallback so
torch.func.vmap can trace per-sample gradients (reference
text_to_image/grad_text_to_image_lora.py:21-22; SURVEY.md §2.6). On TPU two
compose cleanly: `jax.nn.dot_product_attention` lowers to fused XLA attention
and composes with jax.vmap/jax.grad (so TRAK per-sample gradients need no
hack), and `flash_attention` below is a Pallas kernel for the larger LDM
shapes (64x64 = 4096 latent tokens).

Kernel design (pallas_guide.md): sequences in these workloads are short
enough (<= 4096 tokens, SURVEY.md §5.7) that one (batch*head) slice of K and
V fits VMEM whole (4096 x 128 x 4 B = 2 MB each), so the kernel tiles only
the query axis — each grid program computes a (BLOCK_Q, Skv) score tile on
the MXU, a numerically stable softmax on the VPU, and the (BLOCK_Q, D)
output matmul, never materializing scores in HBM. No online/running-max
accumulation is needed because K never tiles.

Backward runs the plain XLA formulation via jax.custom_vjp recompute — the
sampling loops that dominate wall-clock (100-step DDIM) are forward-only, so
the kernel accelerates exactly the hot path while training keeps XLA's fused
gradient.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Flash kernel pays off once the score matrix stops being tiny. Measured on
# v5e (bf16, vs XLA fused attention): 2.1x at (8,4096,8,64); 1.74x at the
# celeba level-1 shape (32,1024,14,32); 1.56x at miniSD's (64,1024,8,40);
# 0.78x at 256 tokens — so dispatch at >= 1024, XLA below. End to end this
# is 1.23x on the celeba DDIM sampling loop (the behavior-scoring hot path;
# forward-only, so the kernel covers it fully) and ~1x on the conv-dominated
# train step (whose backward recomputes through XLA anyway).
_FLASH_MIN_Q_LEN = 1024
_BLOCK_Q = 256
_LANE = 128


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.dot_product_attention(q, k, v)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, kv_len: int):
    """One program: (BLOCK_Q, D) queries vs the full (Skv, D) K/V slice.

    Matmuls run in the input dtype (bf16 inputs use the MXU at full rate)
    with f32 accumulation; softmax statistics stay f32 on the VPU.
    """
    q, k, v = q_ref[0], k_ref[0], v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Skv_p) f32
    if kv_len < s.shape[-1]:  # mask the zero-padded KV columns
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0] = (o / denom).astype(o_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) flash attention via pallas_call (forward only)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d**0.5)

    # (B, S, H, D) -> (B*H, S, D); pad S to the query block and D to the lane.
    dp = _round_up(d, _LANE)
    sq_p = _round_up(sq, _BLOCK_Q)
    skv_p = _round_up(skv, _BLOCK_Q)

    def to_bh(x, s):
        x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
        return jnp.pad(
            x, ((0, 0), (0, _round_up(s, _BLOCK_Q) - s), (0, dp - d))
        ) if (s % _BLOCK_Q or d % _LANE) else x

    qb = to_bh(q, sq)
    kb = jnp.pad(
        jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, skv, d),
        ((0, 0), (0, skv_p - skv), (0, dp - d)),
    )
    vb = jnp.pad(
        jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, skv, d),
        ((0, 0), (0, skv_p - skv), (0, dp - d)),
    )

    grid = (b * h, sq_p // _BLOCK_Q)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=skv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qb, kb, vb)

    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pallas flash attention on (B, S, H, D); XLA-recompute backward."""
    return _flash_forward(q, k, v)


def _flash_fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    _, vjp = jax.vjp(_xla_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Scaled dot-product attention on (B, S, H, D); picks the Pallas flash
    kernel for the long-sequence LDM shapes, fused XLA attention otherwise."""
    if q.shape[1] >= _FLASH_MIN_Q_LEN and q.shape[-1] <= _LANE:
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)
