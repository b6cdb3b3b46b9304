"""Fused GroupNorm(+SiLU) with a Pallas TPU kernel and a custom VJP.

GroupNorm is the dominant non-MXU cost of the diffusion train step: the
per-op HLO profile of the CIFAR ensemble step (docs/profile_cifar_train.txt)
attributes ~19% of device time to reduce/elementwise fusions, most of them
the GN statistics and GN backward reductions that XLA cannot fold into the
conv fusions. The reference leans on cuDNN/torch GroupNorm kernels for the
same blocks (reference src/diffusers vendored blocks; SURVEY.md §2.6 lists
the native deps this module replaces on TPU).

Kernel design (pallas_guide.md):

* One grid step per batch row; the whole (H*W, C) slice sits in VMEM (all
  the diffusion U-Nets here normalize <= a few MB per row — the dispatcher
  falls back to the XLA reference path above a VMEM budget).
* Group statistics never reshape across lanes. Row sums give per-channel
  (1, C) vectors; per-group sums and the broadcast back to channels are two
  tiny one-hot matmuls with a (C, G) segment matrix on the MXU, avoiding
  segmented lane reductions the VPU can't tile.
* Forward reads x once (bf16) and writes the normalized+SiLU output once,
  in the conv input dtype; mean/rstd (B, G) f32 are the only residual
  statistics. The XLA lowering reads x at least twice (stats + normalize)
  and round-trips f32 intermediates.
* Backward is one kernel per batch row: recomputes x_hat from (x, mean,
  rstd), applies the SiLU chain rule in-register, and emits dx plus
  per-row partial (B, C) dgamma/dbeta that XLA sums (a trivial reduction,
  not worth grid-carried accumulation).

The op composes with jax.vmap (the ensemble member axis) via Pallas' batching
rule and with jax.checkpoint (remat recomputes the forward kernel).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Above this many bytes of f32 working set per batch row, fall back to XLA
# (VMEM is ~16 MB/core; the kernel holds ~3 f32 copies of the row slice).
_VMEM_ROW_BUDGET = 4 * 1024 * 1024


def _xla_group_norm_silu(x, gamma, beta, groups, eps, silu, out_dtype):
    """Reference XLA path (also the CPU/interpret ground truth)."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, groups, c // groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=(1, 3), keepdims=True) - jnp.square(mean)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    y = y.reshape(x.shape) * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    if silu:
        y = y * jax.nn.sigmoid(y)
    return y.astype(out_dtype)


def _seg_matrix(c: int, groups: int) -> jnp.ndarray:
    """(C, G) one-hot channel->group segment matrix."""
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    return (ch // (c // groups) == gr).astype(jnp.float32)


def _fwd_kernel(x_ref, gamma_ref, beta_ref, seg_ref, out_ref, mean_ref, rstd_ref,
                *, eps: float, silu: bool):
    xf = x_ref[0].astype(jnp.float32)  # (HW, C)
    seg = seg_ref[:]  # (C, G)
    n = xf.shape[0] * (xf.shape[1] // seg.shape[1])
    s1 = jnp.sum(xf, axis=0, keepdims=True)  # (1, C)
    s2 = jnp.sum(xf * xf, axis=0, keepdims=True)
    g1 = jnp.dot(s1, seg, preferred_element_type=jnp.float32)  # (1, G)
    g2 = jnp.dot(s2, seg, preferred_element_type=jnp.float32)
    mean = g1 / n
    var = g2 / n - mean * mean
    rstd = jax.lax.rsqrt(var + eps)
    mean_c = jnp.dot(mean, seg.T, preferred_element_type=jnp.float32)  # (1, C)
    rstd_c = jnp.dot(rstd, seg.T, preferred_element_type=jnp.float32)
    y = (xf - mean_c) * rstd_c * gamma_ref[:] + beta_ref[:]
    if silu:
        y = y * jax.nn.sigmoid(y)
    out_ref[0] = y.astype(out_ref.dtype)
    mean_ref[0] = mean
    rstd_ref[0] = rstd


def _bwd_kernel(x_ref, g_ref, gamma_ref, beta_ref, seg_ref, mean_ref, rstd_ref,
                dx_ref, dgamma_ref, dbeta_ref, *, eps: float, silu: bool):
    xf = x_ref[0].astype(jnp.float32)  # (HW, C)
    g = g_ref[0].astype(jnp.float32)
    seg = seg_ref[:]  # (C, G)
    gamma = gamma_ref[:]  # (1, C)
    n = xf.shape[0] * (xf.shape[1] // seg.shape[1])
    mean_c = jnp.dot(mean_ref[0], seg.T, preferred_element_type=jnp.float32)
    rstd_c = jnp.dot(rstd_ref[0], seg.T, preferred_element_type=jnp.float32)
    xhat = (xf - mean_c) * rstd_c
    if silu:
        y = xhat * gamma + beta_ref[:]
        sig = jax.nn.sigmoid(y)
        dy = g * sig * (1.0 + y * (1.0 - sig))
    else:
        dy = g
    dgamma_ref[0] = jnp.sum(dy * xhat, axis=0, keepdims=True)
    dbeta_ref[0] = jnp.sum(dy, axis=0, keepdims=True)
    dyg = dy * gamma
    m1 = jnp.dot(jnp.sum(dyg, axis=0, keepdims=True), seg,
                 preferred_element_type=jnp.float32) / n  # (1, G)
    m2 = jnp.dot(jnp.sum(dyg * xhat, axis=0, keepdims=True), seg,
                 preferred_element_type=jnp.float32) / n
    m1_c = jnp.dot(m1, seg.T, preferred_element_type=jnp.float32)
    m2_c = jnp.dot(m2, seg.T, preferred_element_type=jnp.float32)
    dx = rstd_c * (dyg - m1_c - xhat * m2_c)
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _pallas_fwd(x3, gamma, beta, groups, eps, silu, out_dtype, interpret):
    b, hw, c = x3.shape
    seg = _seg_matrix(c, groups)
    kernel = functools.partial(_fwd_kernel, eps=eps, silu=silu)
    row = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, c), lambda i: (0, 0))
    segspec = pl.BlockSpec((c, groups), lambda i: (0, 0))
    out, mean, rstd = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[row, vec, vec, segspec],
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), out_dtype),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, groups), jnp.float32),
        ],
        interpret=interpret,
    )(x3, gamma.reshape(1, c).astype(jnp.float32),
      beta.reshape(1, c).astype(jnp.float32), seg)
    return out, mean, rstd


def _pallas_bwd(x3, g3, gamma, beta, mean, rstd, groups, eps, silu, interpret):
    b, hw, c = x3.shape
    seg = _seg_matrix(c, groups)
    kernel = functools.partial(_bwd_kernel, eps=eps, silu=silu)
    row = pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0))
    vec = pl.BlockSpec((1, c), lambda i: (0, 0))
    stat = pl.BlockSpec((1, 1, groups), lambda i: (i, 0, 0))
    dx, dgamma_p, dbeta_p = pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[row, row, vec, vec,
                  pl.BlockSpec((c, groups), lambda i: (0, 0)), stat, stat],
        out_specs=[
            pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i: (i, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, 1, c), jnp.float32),
        ],
        interpret=interpret,
    )(x3, g3, gamma.reshape(1, c).astype(jnp.float32),
      beta.reshape(1, c).astype(jnp.float32), seg, mean, rstd)
    return dx, jnp.sum(dgamma_p, axis=(0, 1)), jnp.sum(dbeta_p, axis=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def _gn_silu_pallas(x3, gamma, beta, groups, eps, silu, out_dtype, interpret):
    out, _, _ = _pallas_fwd(x3, gamma, beta, groups, eps, silu, out_dtype,
                            interpret)
    return out


def _gn_fwd_rule(x3, gamma, beta, groups, eps, silu, out_dtype, interpret):
    out, mean, rstd = _pallas_fwd(x3, gamma, beta, groups, eps, silu,
                                  out_dtype, interpret)
    return out, (x3, gamma, beta, mean, rstd)


def _gn_bwd_rule(groups, eps, silu, out_dtype, interpret, res, g):
    x3, gamma, beta, mean, rstd = res
    dx, dgamma, dbeta = _pallas_bwd(
        x3, g.astype(x3.dtype), gamma, beta, mean, rstd, groups, eps, silu,
        interpret)
    return dx, dgamma.astype(gamma.dtype), dbeta.astype(beta.dtype)


_gn_silu_pallas.defvjp(_gn_fwd_rule, _gn_bwd_rule)


def _use_pallas(shape, interpret: bool) -> bool:
    if interpret:
        return True
    # Measured on v5e (scripts/bench_gn.py, GN+SiLU+conv3x3 chain under the
    # ensemble vmap at the CIFAR bench shapes): the Pallas kernel's stats
    # pass is fine, but XLA already folds the normalize+SiLU elementwise
    # tail into the consuming conv fusion, so the standalone kernel's extra
    # HBM round trip loses end-to-end (0.77-0.85x). Keep it opt-in for
    # shapes/backends where the XLA lowering degrades.
    if os.environ.get("GADM_PALLAS_GN", "0") != "1":
        return False
    if jax.default_backend() != "tpu":
        return False
    hw = 1
    for d in shape[1:-1]:
        hw *= d
    return hw * shape[-1] * 4 <= _VMEM_ROW_BUDGET


def group_norm_silu(
    x: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    *,
    groups: int = 32,
    eps: float = 1e-6,
    silu: bool = True,
    out_dtype=None,
    interpret: bool = False,
) -> jnp.ndarray:
    """GroupNorm over the channel-last axis, optionally fused with SiLU.

    x: (B, ..., C) with C % groups == 0. Statistics are computed in f32 over
    all non-batch axes per channel group (torch GroupNorm semantics, matching
    the reference's diffusers blocks). Returns out_dtype (default x.dtype).
    """
    out_dtype = jnp.dtype(out_dtype or x.dtype)
    c = x.shape[-1]
    if c % groups:
        raise ValueError(f"channels {c} not divisible by groups {groups}")
    if not _use_pallas(x.shape, interpret):
        return _xla_group_norm_silu(x, gamma, beta, groups, eps, silu, out_dtype)
    b = x.shape[0]
    x3 = x.reshape(b, -1, c)
    out = _gn_silu_pallas(x3, gamma, beta, groups, eps, silu, out_dtype,
                          interpret)
    return out.reshape(x.shape)
