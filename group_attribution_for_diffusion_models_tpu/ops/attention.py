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
V fits VMEM whole, so kernels tile only one sequence axis. Everything runs in
a TRANSPOSED (B*H, D, S) layout: head dims here are 32-160 and all divide 8,
so putting D on sublanes and S on lanes tiles with ZERO padding — the naive
(S, D) layout pads D to the 128 lane width, a 3.2x memory blowup at D=40
that made large ensemble train steps OOM. Scores are kept key-major
(Skv, Sq), so per-query softmax statistics are lane vectors that broadcast
across key rows for free.

Backward is a pair of Pallas kernels (FlashAttention-2 style): dQ recomputes
scores for its query block against the whole K/V slice — including the
softmax stats and the delta = rowsum(dO*O) term, so the forward needs no
extra outputs and residuals are just (q, k, v) — and emits lse/delta for the
dK/dV kernel, which tiles the key axis against the whole Q/dO slice. Neither
materializes an (Sq, Skv) matrix in HBM; the XLA-recompute backward this
replaces allocated an 8 GB f32 score tensor per attention layer on the
4-member x batch-64 miniSD ensemble step.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Flash kernel pays off once the score matrix stops being tiny. Measured on
# v5e (bf16, vs XLA fused attention): 2.1x at (8,4096,8,64); 1.74x at the
# celeba level-1 shape (32,1024,14,32); 1.56x at miniSD's (64,1024,8,40);
# 0.78x at 256 tokens — so dispatch at >= 1024, XLA below.
_FLASH_MIN_Q_LEN = 1024
_BLOCK = 256  # query/key block length
_STAT_SUB = 8  # lse/delta sublane replication (minimal legal f32 tile)
_NEG_INF = -1e30


def _xla_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    return jax.nn.dot_product_attention(q, k, v)


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _to_ds(x: jnp.ndarray, block: int) -> jnp.ndarray:
    """(B, S, H, D) -> (B*H, D, S_pad): D on sublanes, S on lanes."""
    b, s, h, d = x.shape
    sp = _round_up(s, block)
    x = jnp.transpose(x, (0, 2, 3, 1)).reshape(b * h, d, s)
    if s != sp:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, sp - s)))
    return x


def _from_ds(x: jnp.ndarray, b: int, s: int, h: int, d: int) -> jnp.ndarray:
    return jnp.transpose(x[:, :, :s].reshape(b, h, d, s), (0, 3, 1, 2))


def _scores_t(kt, qt, scale, kv_len):
    """Key-major scores sT = scale * K^T Q with padded key rows masked."""
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Skv_blk, Sq_blk) f32
    row = jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    return jnp.where(row < kv_len, st, _NEG_INF)


def _flash_kernel(qt_ref, kt_ref, vt_ref, ot_ref, *, scale: float, kv_len: int):
    """One program: (D, BQ) queries vs the full (D, Skv) K/V slice.

    Matmuls run in the input dtype (bf16 inputs use the MXU at full rate)
    with f32 accumulation; softmax statistics stay f32 on the VPU as lane
    vectors (reductions over the key/sublane axis).
    """
    qt, kt, vt = qt_ref[0], kt_ref[0], vt_ref[0]
    st = _scores_t(kt, qt, scale, kv_len)  # (Skv, BQ)
    m = jnp.max(st, axis=0, keepdims=True)  # (1, BQ)
    p = jnp.exp(st - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    pn = (p / denom).astype(vt.dtype)
    ot = jax.lax.dot_general(
        vt, pn, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, BQ)
    ot_ref[0] = ot.astype(ot_ref.dtype)


def _flash_bwd_dq_kernel(
    qt_ref, kt_ref, vt_ref, dot_ref, dqt_ref, lse_ref, delta_ref,
    *, scale: float, kv_len: int,
):
    """dQ for one (D, BQ) query block against the whole K/V slice.

    Recomputes the forward softmax (saving the forward any extra outputs)
    and emits lse/delta — the per-query statistics the dK/dV kernel needs —
    as sublane-replicated lane vectors.
    """
    qt, kt, vt, dot_ = qt_ref[0], kt_ref[0], vt_ref[0], dot_ref[0]
    st = _scores_t(kt, qt, scale, kv_len)  # (Skv, BQ)
    m = jnp.max(st, axis=0, keepdims=True)
    p = jnp.exp(st - m)
    denom = jnp.sum(p, axis=0, keepdims=True)
    pn = p / denom  # (Skv, BQ) f32
    ot = jax.lax.dot_general(
        vt, pn.astype(vt.dtype), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, BQ)
    delta = jnp.sum(ot * dot_.astype(jnp.float32), axis=0, keepdims=True)  # (1, BQ)
    dpt = jax.lax.dot_general(
        vt, dot_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Skv, BQ)
    dst = (pn * (dpt - delta)).astype(qt.dtype)
    dqt = jax.lax.dot_general(
        kt, dst, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, BQ)
    dqt_ref[0] = (dqt * scale).astype(dqt_ref.dtype)
    lse_ref[0] = jnp.broadcast_to(m + jnp.log(denom), (_STAT_SUB, m.shape[1]))
    delta_ref[0] = jnp.broadcast_to(delta, (_STAT_SUB, delta.shape[1]))


def _flash_bwd_dkv_kernel(
    kt_ref, vt_ref, qt_ref, dot_ref, lse_ref, delta_ref, dkt_ref, dvt_ref,
    *, scale: float, kv_len: int, block_k: int,
):
    """dK/dV for one (D, BK) key block against the whole Q/dO slice.

    Zero-padded query columns contribute nothing (their dO and delta are
    zero), so only this block's padded KEY rows need masking.
    """
    kt, vt, qt, dot_ = kt_ref[0], vt_ref[0], qt_ref[0], dot_ref[0]
    lse = lse_ref[0][0:1]  # (1, Sq) lane vector
    delta = delta_ref[0][0:1]
    st = jax.lax.dot_general(
        kt, qt, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (BK, Sq)
    pn = jnp.exp(st - lse)  # normalized: exp(s - lse) = p / denom
    j = pl.program_id(1)
    row = j * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
    pn = jnp.where(row < kv_len, pn, 0.0)
    dvt = jax.lax.dot_general(
        dot_, pn.astype(dot_.dtype), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (D, BK)
    dpt = jax.lax.dot_general(
        vt, dot_, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (BK, Sq)
    dst = (pn * (dpt - delta)).astype(qt.dtype)
    dkt = jax.lax.dot_general(
        qt, dst, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (D, BK)
    dkt_ref[0] = (dkt * scale).astype(dkt_ref.dtype)
    dvt_ref[0] = dvt.astype(dvt_ref.dtype)


def _flash_forward(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """(B, S, H, D) flash attention via pallas_call (forward only)."""
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d**0.5)
    sq_p = _round_up(sq, _BLOCK)
    skv_p = _round_up(skv, _BLOCK)

    qt, kt, vt = _to_ds(q, _BLOCK), _to_ds(k, _BLOCK), _to_ds(v, _BLOCK)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, scale=scale, kv_len=skv),
        grid=(b * h, sq_p // _BLOCK),
        in_specs=[
            pl.BlockSpec((1, d, _BLOCK), lambda i, j: (i, 0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d, skv_p), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, d, _BLOCK), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, d, sq_p), q.dtype),
        interpret=jax.default_backend() != "tpu",
    )(qt, kt, vt)

    return _from_ds(out, b, sq, h, d)


def _flash_backward(q, k, v, g):
    """Pallas flash backward: dQ (which also reconstructs the softmax stats)
    over query blocks, then dK/dV over key blocks."""
    from jax.experimental.pallas import tpu as pltpu

    b, sq, h, d = q.shape
    skv = k.shape[1]
    scale = 1.0 / (d**0.5)
    sq_p = _round_up(sq, _BLOCK)
    skv_p = _round_up(skv, _BLOCK)

    qt, kt, vt = _to_ds(q, _BLOCK), _to_ds(k, _BLOCK), _to_ds(v, _BLOCK)
    gt = _to_ds(g, _BLOCK)
    interpret = jax.default_backend() != "tpu"
    stat_shape = jax.ShapeDtypeStruct((b * h, _STAT_SUB, sq_p), jnp.float32)
    stat_spec = pl.BlockSpec((1, _STAT_SUB, _BLOCK), lambda i, j: (i, 0, j),
                             memory_space=pltpu.VMEM)
    stat_full_spec = pl.BlockSpec((1, _STAT_SUB, sq_p), lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    q_blk_spec = pl.BlockSpec((1, d, _BLOCK), lambda i, j: (i, 0, j),
                              memory_space=pltpu.VMEM)
    kv_full_spec = pl.BlockSpec((1, d, skv_p), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)

    dqt, lse, delta = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, kv_len=skv),
        grid=(b * h, sq_p // _BLOCK),
        in_specs=[q_blk_spec, kv_full_spec, kv_full_spec, q_blk_spec],
        out_specs=[q_blk_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, sq_p), q.dtype),
            stat_shape,
            stat_shape,
        ],
        interpret=interpret,
    )(qt, kt, vt, gt)

    kv_blk_spec = pl.BlockSpec((1, d, _BLOCK), lambda i, j: (i, 0, j),
                               memory_space=pltpu.VMEM)
    q_full_spec = pl.BlockSpec((1, d, sq_p), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM)
    dkt, dvt = pl.pallas_call(
        functools.partial(
            _flash_bwd_dkv_kernel, scale=scale, kv_len=skv, block_k=_BLOCK
        ),
        grid=(b * h, skv_p // _BLOCK),
        in_specs=[
            kv_blk_spec, kv_blk_spec, q_full_spec, q_full_spec,
            stat_full_spec, stat_full_spec,
        ],
        out_specs=[kv_blk_spec, kv_blk_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b * h, d, skv_p), k.dtype),
            jax.ShapeDtypeStruct((b * h, d, skv_p), v.dtype),
        ],
        interpret=interpret,
    )(kt, vt, qt, gt, lse, delta)

    return (
        _from_ds(dqt, b, sq, h, d),
        _from_ds(dkt, b, skv, h, d),
        _from_ds(dvt, b, skv, h, d),
    )


@jax.custom_vjp
def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Pallas flash attention on (B, S, H, D) with a Pallas flash backward."""
    return _flash_forward(q, k, v)


def _flash_fwd(q, k, v):
    return _flash_forward(q, k, v), (q, k, v)


def _flash_bwd(res, g):
    q, k, v = res
    return _flash_backward(q, k, v, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Scaled dot-product attention on (B, S, H, D); picks the Pallas flash
    kernel for the long-sequence LDM shapes, fused XLA attention otherwise.
    The kernel's transposed layout requires the head dim to tile sublanes
    (d % 8 == 0 — true for every config in the registry)."""
    if q.shape[1] >= _FLASH_MIN_Q_LEN and q.shape[-1] % 8 == 0 and q.shape[-1] <= 256:
        return flash_attention(q, k, v)
    return _xla_attention(q, k, v)
