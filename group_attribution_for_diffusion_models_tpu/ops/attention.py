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
import os

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


# ---------------------------------------------------------------------------
# Head-packed (layout-free) flash kernels.
#
# The transposed (D, S) kernels above need (B,S,H,D) -> (B*H, D, S)
# relayouts on every operand and output. The SD train-step profile
# (docs/profile_sd_train.txt) shows those transposes — the [attn]-scoped
# non-custom-call events — cost 13.6% of device time, MORE than the flash
# custom calls themselves (10.4%): at head_dim 40-80 the QK^T contraction
# underuses the MXU either way, so the HBM layout copies dominate (XLA's
# strided (B,S,H,D)->(B,H,D,S) copy measured ~6% of HBM bandwidth).
#
# These kernels instead read q in the dense projection's NATURAL
# (B, S, H*D) layout — the per-head split never exists in HBM — and K/V
# pre-transposed to (B, H*D, S) by ONE dense 2-D transpose of the packed
# matrix (XLA's tiled transpose at near-HBM-bandwidth; the per-head strided
# relayout it replaces is ~6x more expensive). Heads are sliced on the
# SUBLANE axis (head dims 32-160 are all multiples of the 8-sublane tile);
# only the small per-block q tile is transposed in VMEM. Per-head math is
# then identical to the (D, S) kernels above. Outputs are written back in
# natural (B, S, H*D) layout, so the surrounding reshapes are free.
# (A first variant that transposed the full K/V slice in VMEM per query
# block measured 0.8x the transposed kernels at S=4096 — the redundant
# grid-step transposes cost more than the HBM relayouts they saved.)
# ---------------------------------------------------------------------------


def _hp_fwd_kernel(q_ref, kt_ref, vt_ref, o_ref, *, scale, kv_len, heads):
    qt = q_ref[0].T  # (HD, BQ) — small per-block in-VMEM transpose
    kt = kt_ref[0]  # (HD, Skv) — pre-transposed in HBM
    vt = vt_ref[0]
    d = qt.shape[0] // heads
    outs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        st = _scores_t(kt[sl], qt[sl], scale, kv_len)  # (Skv, BQ)
        m = jnp.max(st, axis=0, keepdims=True)
        p = jnp.exp(st - m)
        denom = jnp.sum(p, axis=0, keepdims=True)
        pn = (p / denom).astype(vt.dtype)
        outs.append(
            jax.lax.dot_general(
                vt[sl], pn, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # (D, BQ)
    ot = jnp.concatenate(outs, axis=0)  # (HD, BQ)
    o_ref[0] = ot.T.astype(o_ref.dtype)


def _hp_bwd_dq_kernel(
    q_ref, kt_ref, vt_ref, do_ref, dq_ref, lse_ref, delta_ref,
    *, scale, kv_len, heads,
):
    """dQ for one (BQ, HD) query block; re-derives softmax stats per head and
    emits lse/delta into (heads*_STAT_SUB, Sq) stat planes."""
    qt = q_ref[0].T
    kt = kt_ref[0]  # (HD, Skv) — pre-transposed
    vt = vt_ref[0]
    dot_ = do_ref[0].T  # (HD, BQ)
    d = qt.shape[0] // heads
    dqs = []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        st = _scores_t(kt[sl], qt[sl], scale, kv_len)
        m = jnp.max(st, axis=0, keepdims=True)
        p = jnp.exp(st - m)
        denom = jnp.sum(p, axis=0, keepdims=True)
        pn = p / denom
        doh = dot_[sl]  # (D, BQ)
        ot = jax.lax.dot_general(
            vt[sl], pn.astype(vt.dtype), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        delta = jnp.sum(ot * doh.astype(jnp.float32), axis=0, keepdims=True)
        dpt = jax.lax.dot_general(
            vt[sl], doh, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Skv, BQ)
        dst = (pn * (dpt - delta)).astype(qt.dtype)
        dqs.append(
            jax.lax.dot_general(
                kt[sl], dst, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        )  # (D, BQ)
        lse_ref[0, hh * _STAT_SUB:(hh + 1) * _STAT_SUB] = jnp.broadcast_to(
            m + jnp.log(denom), (_STAT_SUB, m.shape[1])
        )
        delta_ref[0, hh * _STAT_SUB:(hh + 1) * _STAT_SUB] = jnp.broadcast_to(
            delta, (_STAT_SUB, delta.shape[1])
        )
    dq_ref[0] = jnp.concatenate(dqs, axis=0).T.astype(dq_ref.dtype)


def _hp_bwd_dkv_kernel(
    kt_ref, vt_ref, qt_ref, dot_ref, lse_ref, delta_ref, dk_ref, dv_ref,
    *, scale, kv_len, heads, block_k,
):
    """dK/dV for one key block against the whole Q/dO slice; every operand
    arrives pre-transposed (HD on sublanes) so no full-slice VMEM transpose
    runs per grid step."""
    kt = kt_ref[0]  # (HD, BK)
    vt = vt_ref[0]
    qt = qt_ref[0]  # (HD, Sq)
    dot_ = dot_ref[0]
    d = kt.shape[0] // heads
    j = pl.program_id(1)
    dks, dvs = [], []
    for hh in range(heads):
        sl = slice(hh * d, (hh + 1) * d)
        lse = lse_ref[0, hh * _STAT_SUB:hh * _STAT_SUB + 1]  # (1, Sq)
        delta = delta_ref[0, hh * _STAT_SUB:hh * _STAT_SUB + 1]
        st = jax.lax.dot_general(
            kt[sl], qt[sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale  # (BK, Sq)
        pn = jnp.exp(st - lse)  # normalized: exp(s - lse) = p / denom
        row = j * block_k + jax.lax.broadcasted_iota(jnp.int32, st.shape, 0)
        pn = jnp.where(row < kv_len, pn, 0.0)
        dvs.append(
            jax.lax.dot_general(
                dot_[sl], pn.astype(dot_.dtype), (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        )  # (D, BK)
        dpt = jax.lax.dot_general(
            vt[sl], dot_[sl], (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (BK, Sq)
        dst = (pn * (dpt - delta)).astype(qt.dtype)
        dks.append(
            jax.lax.dot_general(
                qt[sl], dst, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
        )  # (D, BK)
    dk_ref[0] = jnp.concatenate(dks, axis=0).T.astype(dk_ref.dtype)
    dv_ref[0] = jnp.concatenate(dvs, axis=0).T.astype(dv_ref.dtype)


def _hp_pad_kv(k3, v3):
    """Pad the key length to the sublane tile so VMEM blocks are aligned and
    padded K rows enter the masked-score path with defined (zero) values."""
    skv = k3.shape[1]
    skv_a = _round_up(skv, 16 if k3.dtype == jnp.bfloat16 else 8)
    if skv != skv_a:
        pad = ((0, 0), (0, skv_a - skv), (0, 0))
        k3, v3 = jnp.pad(k3, pad), jnp.pad(v3, pad)
    return k3, v3, skv_a


def _hp_call_kwargs(interpret: bool) -> dict:
    """Raise Mosaic's scoped-VMEM cap for the head-packed kernels: they hold
    the full (Skv, H*D) K/V slice plus per-head f32 score planes in VMEM
    (~25 MB at the miniSD level-0 geometry 4096x320), above the 16 MB
    default but far under the 128 MB v5e VMEM."""
    if interpret:
        return {}
    from jax.experimental.pallas import tpu as pltpu

    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


def _hp_forward(q3, k3, v3, heads: int, d: int):
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q3.shape
    skv = k3.shape[1]
    scale = 1.0 / (d**0.5)
    k3, v3, skv_a = _hp_pad_kv(k3, v3)
    # One dense 2-D transpose per operand in HBM (cheap, coalesced) so the
    # kernel never re-transposes the full K/V slice per query block.
    kt3 = jnp.swapaxes(k3, 1, 2)  # (B, HD, Skv)
    vt3 = jnp.swapaxes(v3, 1, 2)
    interpret = jax.default_backend() != "tpu"

    q_spec = pl.BlockSpec((1, _BLOCK, hd), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, hd, skv_a), lambda i, j: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_hp_fwd_kernel, scale=scale, kv_len=skv, heads=heads),
        grid=(b, sq // _BLOCK),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((b, sq, hd), q3.dtype),
        interpret=interpret,
        **_hp_call_kwargs(interpret),
    )(q3, kt3, vt3)


def _hp_backward(q3, k3, v3, g3, heads: int, d: int):
    from jax.experimental.pallas import tpu as pltpu

    b, sq, hd = q3.shape
    skv = k3.shape[1]
    scale = 1.0 / (d**0.5)
    interpret = jax.default_backend() != "tpu"
    k3p, v3p, _ = _hp_pad_kv(k3, v3)
    skv_b = _round_up(skv, _BLOCK)
    kt3 = jnp.swapaxes(k3p, 1, 2)  # (B, HD, Skv) — single dense transpose
    vt3 = jnp.swapaxes(v3p, 1, 2)

    q_spec = pl.BlockSpec((1, _BLOCK, hd), lambda i, j: (i, j, 0),
                          memory_space=pltpu.VMEM)
    kv_full_spec = pl.BlockSpec((1, hd, kt3.shape[2]), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    stat_spec = pl.BlockSpec((1, heads * _STAT_SUB, _BLOCK),
                             lambda i, j: (i, 0, j), memory_space=pltpu.VMEM)
    stat_shape = jax.ShapeDtypeStruct((b, heads * _STAT_SUB, sq), jnp.float32)

    dq3, lse, delta = pl.pallas_call(
        functools.partial(
            _hp_bwd_dq_kernel, scale=scale, kv_len=skv, heads=heads
        ),
        grid=(b, sq // _BLOCK),
        in_specs=[q_spec, kv_full_spec, kv_full_spec, q_spec],
        out_specs=[q_spec, stat_spec, stat_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, sq, hd), q3.dtype),
            stat_shape,
            stat_shape,
        ],
        interpret=interpret,
        **_hp_call_kwargs(interpret),
    )(q3, kt3, vt3, g3)

    if kt3.shape[2] != skv_b:
        pad = ((0, 0), (0, 0), (0, skv_b - kt3.shape[2]))
        kt3, vt3 = jnp.pad(kt3, pad), jnp.pad(vt3, pad)
    qt3 = jnp.swapaxes(q3, 1, 2)  # (B, HD, Sq) for the key-tiled kernel
    dot3 = jnp.swapaxes(g3, 1, 2)
    kvt_blk_spec = pl.BlockSpec((1, hd, _BLOCK), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
    kv_out_spec = pl.BlockSpec((1, _BLOCK, hd), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
    qt_full_spec = pl.BlockSpec((1, hd, sq), lambda i, j: (i, 0, 0),
                                memory_space=pltpu.VMEM)
    stat_full_spec = pl.BlockSpec((1, heads * _STAT_SUB, sq),
                                  lambda i, j: (i, 0, 0),
                                  memory_space=pltpu.VMEM)
    dk3, dv3 = pl.pallas_call(
        functools.partial(
            _hp_bwd_dkv_kernel, scale=scale, kv_len=skv, heads=heads,
            block_k=_BLOCK,
        ),
        grid=(b, skv_b // _BLOCK),
        in_specs=[
            kvt_blk_spec, kvt_blk_spec, qt_full_spec, qt_full_spec,
            stat_full_spec, stat_full_spec,
        ],
        out_specs=[kv_out_spec, kv_out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((b, skv_b, hd), k3.dtype),
            jax.ShapeDtypeStruct((b, skv_b, hd), v3.dtype),
        ],
        interpret=interpret,
        **_hp_call_kwargs(interpret),
    )(kt3, vt3, qt3, dot3, lse, delta)
    return dq3, dk3[:, :skv], dv3[:, :skv]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _hp_flash(q3, k3, v3, hd_spec):
    return _hp_forward(q3, k3, v3, *hd_spec)


def _hp_fwd_rule(q3, k3, v3, hd_spec):
    return _hp_forward(q3, k3, v3, *hd_spec), (q3, k3, v3)


def _hp_bwd_rule(hd_spec, res, g3):
    q3, k3, v3 = res
    return _hp_backward(q3, k3, v3, g3, *hd_spec)


_hp_flash.defvjp(_hp_fwd_rule, _hp_bwd_rule)


def flash_attention_hp(q, k, v):
    """Head-packed Pallas flash attention on (B, S, H, D).

    No HBM layout copies: the (B, S, H, D) views are reshaped (free) to the
    projections' natural (B, S, H*D) layout and heads are split on VMEM
    sublanes inside the kernels."""
    b, sq, h, d = q.shape
    skv = k.shape[1]
    return _hp_flash(
        q.reshape(b, sq, h * d), k.reshape(b, skv, h * d),
        v.reshape(b, skv, h * d), (h, d),
    ).reshape(b, sq, h, d)


# ---------------------------------------------------------------------------
# Direction-mixed dispatch.
#
# The fastest FORWARD and the fastest BACKWARD implementation are not the
# same kernel at several of the registry's real attention geometries
# (scripts/bench_hp_attention.py; docs/attn_dispatch_table.json, v5e):
# e.g. at miniSD level-0 (B256, S1024, H8, D40) XLA's fused attention wins
# the forward 1.66x over the transposed Pallas kernel, while the Pallas
# backwards beat XLA's vjp 2.1x. Because both Pallas backwards recompute
# the softmax from (q, k, v) alone (no forward residuals beyond the
# operands), the forward and backward can be chosen INDEPENDENTLY: a
# custom_vjp runs the measured-best forward as the primal and the
# measured-best backward as the cotangent rule.
# ---------------------------------------------------------------------------


def _hp_forward_bshd(q, k, v):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    return _hp_forward(
        q.reshape(b, sq, h * d), k.reshape(b, skv, h * d),
        v.reshape(b, skv, h * d), h, d,
    ).reshape(b, sq, h, d)


def _hp_backward_bshd(q, k, v, g):
    b, sq, h, d = q.shape
    skv = k.shape[1]
    dq3, dk3, dv3 = _hp_backward(
        q.reshape(b, sq, h * d), k.reshape(b, skv, h * d),
        v.reshape(b, skv, h * d), g.reshape(b, sq, h * d), h, d,
    )
    return (
        dq3.reshape(b, sq, h, d),
        dk3.reshape(b, skv, h, d),
        dv3.reshape(b, skv, h, d),
    )


def _xla_backward(q, k, v, g):
    return jax.vjp(_xla_attention, q, k, v)[1](g)


_ATTN_FWD = {"xla": _xla_attention, "t": _flash_forward, "hp": _hp_forward_bshd}
_ATTN_BWD = {"xla": _xla_backward, "t": _flash_backward, "hp": _hp_backward_bshd}


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _attn_mixed(q, k, v, spec):
    return _ATTN_FWD[spec[0]](q, k, v)


def _attn_mixed_fwd(q, k, v, spec):
    return _ATTN_FWD[spec[0]](q, k, v), (q, k, v)


def _attn_mixed_bwd(spec, res, g):
    return _ATTN_BWD[spec[1]](*res, g)


_attn_mixed.defvjp(_attn_mixed_fwd, _attn_mixed_bwd)

# Measured dispatch table over the REAL (Sq, H, D, cross?) grid the
# registry's models hit, at the benches' batch sizes (v5e, bf16;
# scripts/bench_hp_attention.py writes the full measurement to
# docs/attn_dispatch_table.json — regenerate after kernel changes).
# Values are (fwd_impl, bwd_impl). Shapes not listed fall back to the
# conservative rule below. NOTE batch size moves the forward winner at
# S=1024 (B32 -> t, B256 -> xla); entries are keyed by the geometry the
# model family actually batches.
_DISPATCH_TABLE = {
    # CIFAR DDPM level-1 (single head, d=256): XLA wins both directions.
    (256, 1, 256, False): ("xla", "xla"),
    # celeba level-1 (B32): transposed fwd 1.94x, hp bwd 2.2x over XLA.
    (1024, 14, 32, False): ("t", "hp"),
    # celeba level-2: head-packed both directions.
    (256, 21, 32, False): ("hp", "hp"),
    # miniSD/imagenette level-0 self (B256): XLA fwd, Pallas bwd (2.1x).
    (1024, 8, 40, False): ("xla", "hp"),
    # miniSD/imagenette level-1 self: head-packed both (1.40x/1.36x).
    (256, 8, 80, False): ("hp", "hp"),
    # miniSD/imagenette cross-attention vs 77 text tokens: head-packed
    # (1.37x/1.68x fwd at levels 0/1); level-2 (S=64) stays XLA.
    (1024, 8, 40, True): ("hp", "hp"),
    (256, 8, 80, True): ("hp", "hp"),
    # 512px-latent variants (S=4096): transposed self, head-packed cross
    # (t fwd 2.28x XLA at (8,4096,8,40); hp cross 3.3x).
    (4096, 8, 40, False): ("t", "t"),
    (4096, 8, 40, True): ("hp", "hp"),
    (1024, 8, 80, False): ("hp", "hp"),
}


def dot_product_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Scaled dot-product attention on (B, S, H, D) with measured per-shape,
    per-direction kernel dispatch (see _DISPATCH_TABLE). The Pallas kernels
    require the head dim to tile sublanes (d % 8 == 0 — true for every
    config in the registry) and a _BLOCK-aligned query length for the
    head-packed layout. GADM_FLASH_LAYOUT=hp|t|xla forces one
    implementation for both directions."""
    sq, h, d = q.shape[1], q.shape[2], q.shape[3]
    skv = k.shape[1]
    layout = os.environ.get("GADM_FLASH_LAYOUT", "auto")
    pallas_ok = d % 8 == 0 and d <= 256
    hp_ok = pallas_ok and sq % _BLOCK == 0
    if layout != "auto":
        if layout == "t" and pallas_ok:
            return flash_attention(q, k, v)
        if layout == "hp" and hp_ok:
            return flash_attention_hp(q, k, v)
        return _xla_attention(q, k, v)
    spec = _DISPATCH_TABLE.get((sq, h, d, skv != sq))
    if spec is None:
        # Unmeasured shape: Pallas flash for long sequences (2.1x XLA at
        # 4096 tokens), XLA below — the pre-table rule.
        if sq >= _FLASH_MIN_Q_LEN and pallas_ok:
            spec = ("hp", "hp") if (d >= 64 and hp_ok) else ("t", "t")
        else:
            spec = ("xla", "xla")
    if spec == ("xla", "xla"):
        return _xla_attention(q, k, v)  # native vjp shares fwd residuals
    if spec == ("t", "t"):
        return flash_attention(q, k, v)
    if spec == ("hp", "hp"):
        return flash_attention_hp(q, k, v)
    if spec[0] == "hp" and not hp_ok:
        spec = ("t", spec[1])
    if spec[1] == "hp" and not hp_ok:
        spec = (spec[0], "t")
    return _attn_mixed(q, k, v, spec)
