"""8-bit-state Adam: blockwise int8 quantization of optimizer moments.

The TPU-native equivalent of bitsandbytes Adam8bit, which the reference
needs to fit 256^2 LDM training on small GPUs (reference
unconditional_generation/main.py:562-588; SURVEY.md §2.6): both Adam moments
are stored as int8 with one fp32 absmax scale per 2048-element block,
cutting optimizer-state HBM ~4x (8+8 bits vs 32+32 per parameter). The
dequant -> update -> requant round-trip is fully jittable elementwise work
that XLA fuses into the update; on an ensemble this multiplies directly by
the member count.

Exposed as an optax GradientTransformation (`adam8bit`), selectable through
training.make_optimizer(name="adam8bit").
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

BLOCK = 2048


def _quantize(x: jnp.ndarray):
    """(int8 blocks, fp32 per-block scales, original size) of a flat array."""
    flat = x.ravel()
    n = flat.shape[0]
    pad = (-n) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    scales = jnp.max(jnp.abs(blocks), axis=1, keepdims=True) / 127.0
    safe = jnp.maximum(scales, 1e-12)
    q = jnp.clip(jnp.round(blocks / safe), -127, 127).astype(jnp.int8)
    return q, scales.astype(jnp.float32)


def _dequantize(q: jnp.ndarray, scales: jnp.ndarray, shape) -> jnp.ndarray:
    flat = (q.astype(jnp.float32) * scales).ravel()
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


def _quantize_log(x: jnp.ndarray):
    """Affine int8 quantization of log2(x) per block — for the second moment.

    v spans many orders of magnitude within a block; linear absmax would zero
    the small entries and blow up m/sqrt(v). Log-space affine keeps relative
    resolution: v is recovered within a factor 2^(range/254) (same idea as
    bitsandbytes' dynamic quantization map).
    """
    flat = x.ravel()
    n = flat.shape[0]
    pad = (-n) % BLOCK
    flat = jnp.pad(flat, (0, pad))
    blocks = flat.reshape(-1, BLOCK)
    # Floor must stay in fp32 normal range: XLA flushes subnormals to zero,
    # and log2(0) = -inf would poison the block statistics.
    l = jnp.log2(jnp.maximum(blocks, 1e-30))
    lmin = jnp.min(l, axis=1, keepdims=True)
    lmax = jnp.max(l, axis=1, keepdims=True)
    scale = jnp.maximum((lmax - lmin) / 254.0, 1e-8)
    q = (jnp.round((l - lmin) / scale) - 127.0).astype(jnp.int8)
    return q, lmin.astype(jnp.float32), scale.astype(jnp.float32)


def _dequantize_log(q, lmin, scale, shape) -> jnp.ndarray:
    l = (q.astype(jnp.float32) + 127.0) * scale + lmin
    flat = jnp.exp2(l).ravel()
    n = 1
    for s in shape:
        n *= s
    return flat[:n].reshape(shape)


class _QMoment(NamedTuple):
    q: jnp.ndarray
    scales: jnp.ndarray


class _QLogMoment(NamedTuple):
    q: jnp.ndarray
    lmin: jnp.ndarray
    scale: jnp.ndarray


class Adam8bitState(NamedTuple):
    count: jnp.ndarray
    mu: object  # pytree of _QMoment
    nu: object  # pytree of _QMoment


def adam8bit(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    """Adam whose m/v states live as blockwise-int8 + fp32 scales."""
    sched = (
        learning_rate
        if callable(learning_rate)
        else optax.constant_schedule(learning_rate)
    )

    def init_fn(params):
        def zero_lin(p):
            q, s = _quantize(jnp.zeros_like(p, dtype=jnp.float32))
            return _QMoment(q, s)

        def zero_log(p):
            q, lmin, s = _quantize_log(jnp.zeros_like(p, dtype=jnp.float32))
            return _QLogMoment(q, lmin, s)

        return Adam8bitState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(zero_lin, params),
            nu=jax.tree_util.tree_map(zero_log, params),
        )

    def update_fn(grads, state, params=None):
        count = state.count + 1
        lr = sched(count)
        b1c = 1.0 - b1**count.astype(jnp.float32)
        b2c = 1.0 - b2**count.astype(jnp.float32)

        def one(g, qm, qv):
            m = _dequantize(qm.q, qm.scales, g.shape)
            v = _dequantize_log(qv.q, qv.lmin, qv.scale, g.shape)
            # First step: v starts from true zero (the log codec can't
            # represent exact 0, so gate on count).
            v = jnp.where(state.count == 0, jnp.zeros_like(v), v)
            g = g.astype(jnp.float32)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            upd = -lr * (m / b1c) / (jnp.sqrt(v / b2c) + eps)
            qm2, sm2 = _quantize(m)
            qv2, lmin2, sv2 = _quantize_log(v)
            return upd.astype(g.dtype), _QMoment(qm2, sm2), _QLogMoment(qv2, lmin2, sv2)

        leaves_g, treedef = jax.tree_util.tree_flatten(grads)
        leaves_m = treedef.flatten_up_to(state.mu)
        leaves_v = treedef.flatten_up_to(state.nu)
        outs = [one(g, m, v) for g, m, v in zip(leaves_g, leaves_m, leaves_v)]
        updates = treedef.unflatten([o[0] for o in outs])
        mu = treedef.unflatten([o[1] for o in outs])
        nu = treedef.unflatten([o[2] for o in outs])
        return updates, Adam8bitState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
