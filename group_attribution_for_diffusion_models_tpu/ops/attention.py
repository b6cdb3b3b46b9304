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

Backward is a pair of Pallas kernels (FlashAttention-2 style): the forward
saves per-query logsumexp statistics; dQ recomputes probabilities block-by-
block against the whole K/V slice, and dK/dV tiles the key axis against the
whole Q/dO slice. Neither materializes the (Sq, Skv) score matrix in HBM —
the XLA-recompute backward used to allocate an 8 GB f32 score tensor per
attention layer on the 4-member x batch-64 miniSD ensemble train step, which
is what capped ensemble sizes in round 1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

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
_STAT_LANES = 8  # lse/delta replication width (minimal legal trailing dim)


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.dot_product_attention(q, k, v)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, kv_len: int):
    """One program: (BLOCK_Q, D) queries vs the full (Skv, D) K/V slice.

    Matmuls run in the input dtype (bf16 inputs use the MXU at full rate)
    with f32 accumulation; softmax statistics stay f32 on the VPU. Also
    emits the per-query logsumexp, the residual the backward kernels use to
    recompute probabilities without re-running the softmax reduction.
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
    # Stats are stored 8-lane-replicated: TPU blocks need aligned trailing
    # dims, and (BQ, 8) is the smallest layout that tiles legally.
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(denom), (m.shape[0], _STAT_LANES))


def _flash_bwd_dq_kernel(
    q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref, dq_ref,
    *, scale: float, kv_len: int,
):
    """dQ for one (BLOCK_Q, D) query block against the whole K/V slice:
    p = exp(qk^T*scale - lse); ds = p*(dO v^T - delta); dQ = scale * ds K."""
    q, k, v, do = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    lse = lse_ref[0][:, 0:1]  # (BQ, 1) f32
    delta = delta_ref[0][:, 0:1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BQ, Skv_p)
    if kv_len < s.shape[-1]:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, -1e30)
    p = jnp.exp(s - lse)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BQ, Skv_p)
    ds = (p * (dp - delta)).astype(q.dtype)
    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(
    k_ref, v_ref, q_ref, do_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale: float, kv_len: int, block_k: int,
):
    """dK/dV for one (BLOCK_K, D) key block against the whole Q/dO slice.

    Zero-padded query rows contribute nothing (their dO and delta are zero,
    so p^T dO and ds vanish), so only padded KEY columns need masking.
    """
    k, v, q, do = k_ref[0], v_ref[0], q_ref[0], do_ref[0]
    lse = lse_ref[0][:, 0:1]  # (Sq_p, 1)
    delta = delta_ref[0][:, 0:1]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Sq_p, BK)
    j = pl.program_id(1)
    col = j * block_k + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < kv_len, s, -1e30)
    p = jnp.exp(s - lse)  # (Sq_p, BK) f32
    pv = p.astype(do.dtype)
    dv = jax.lax.dot_general(
        pv, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BK, D)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Sq_p, BK)
    ds = (p * (dp - delta)).astype(q.dtype)
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BK, D)
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _to_bh(x, block):
    """(B, S, H, D) -> (B*H, S_pad, D_pad), zero-padded."""
    b, s, h, d = x.shape
    dp = _round_up(d, _LANE)
    sp = _round_up(s, block)
    x = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
    if s != sp or d != dp:
        x = jnp.pad(x, ((0, 0), (0, sp - s), (0, dp - d)))
    return x


def _from_bh(x, b, s, h, d):
    return jnp.transpose(x[:, :s, :d].reshape(b, h, s, d), (0, 2, 1, 3))


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray):
    """(B, S, H, D) flash attention via pallas_call; returns (out, lse)."""
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d**0.5)

    dp = _round_up(d, _LANE)
    sq_p = _round_up(sq, _BLOCK_Q)
    skv_p = _round_up(skv, _BLOCK_Q)

    qb, kb, vb = _to_bh(q, _BLOCK_Q), _to_bh(k, _BLOCK_Q), _to_bh(v, _BLOCK_Q)

    grid = (b * h, sq_p // _BLOCK_Q)
    out, lse = pl.pallas_call(
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
        out_specs=[
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, _STAT_LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
            jax.ShapeDtypeStruct((b * h, sq_p, _STAT_LANES), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(qb, kb, vb)

    return _from_bh(out, b, sq, h, d), lse


def _flash_backward(q, k, v, out, lse, g):
    """Pallas flash backward: dQ over query blocks, dK/dV over key blocks."""
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d**0.5)
    dp = _round_up(d, _LANE)
    sq_p = _round_up(sq, _BLOCK_Q)
    skv_p = _round_up(skv, _BLOCK_Q)

    # delta_i = sum_d dO_i . O_i — cheap rowwise reduction in XLA, stored in
    # the same 8-lane-replicated layout as lse.
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)
    delta = jnp.transpose(delta, (0, 2, 1)).reshape(b * h, sq)  # (BH, Sq)
    if sq != sq_p:
        delta = jnp.pad(delta, ((0, 0), (0, sq_p - sq)))
    delta = jnp.broadcast_to(delta[:, :, None], (b * h, sq_p, _STAT_LANES))

    qb, kb, vb = _to_bh(q, _BLOCK_Q), _to_bh(k, _BLOCK_Q), _to_bh(v, _BLOCK_Q)
    gb = _to_bh(g, _BLOCK_Q)
    interpret = jax.default_backend() != "tpu"

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_len=skv),
        grid=(b * h, sq_p // _BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, skv_p, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, _STAT_LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, _STAT_LANES), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        interpret=interpret,
    )(qb, kb, vb, gb, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, kv_len=skv, block_k=_BLOCK_Q
        ),
        grid=(b * h, skv_p // _BLOCK_Q),
        in_specs=[
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, dp), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, _STAT_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sq_p, _STAT_LANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BLOCK_Q, dp), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, skv_p, dp), k.dtype),
            jax.ShapeDtypeStruct((b * h, skv_p, dp), v.dtype),
        ],
        interpret=interpret,
    )(kb, vb, qb, gb, lse, delta)

    return (
        _from_bh(dq, b, sq, h, d),
        _from_bh(dk, b, skv, h, d),
        _from_bh(dv, b, skv, h, d),
    )


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pallas flash attention on (B, S, H, D) with a Pallas flash backward."""
    out, _ = _flash_forward(q, k, v)
    return out


def _flash_fwd(q, k, v):
    out, lse = _flash_forward(q, k, v)
    return out, (q, k, v, out, lse)


def _flash_bwd(res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Scaled dot-product attention on (B, S, H, D); picks the Pallas flash
    kernel for the long-sequence LDM shapes, fused XLA attention otherwise."""
    if q.shape[1] >= _FLASH_MIN_Q_LEN and q.shape[-1] <= _LANE:
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)
