"""Shared U-Net building blocks (Flax linen, NHWC).

TPU-first re-design of the diffusers block zoo the reference instantiates via
config dicts (reference src/ddpm_config.py:48-82; vendored
src/diffusers/models/attention_processor.py). Everything is NHWC so convs map
straight onto the MXU without layout transposes, GroupNorm statistics run in
fp32 for stability while matmuls/convs can run bf16, and attention flattens
spatial dims into a single short sequence (<=4096 tokens for all workloads —
SURVEY.md §5.7), which XLA fuses well; a Pallas flash-attention path plugs in
via ops.attention for the larger configs.
"""

from __future__ import annotations

import math
import os
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

from ..ops.attention import dot_product_attention
from ..ops.group_norm import group_norm_silu


def sinusoidal_embedding(
    timesteps: jnp.ndarray,
    dim: int,
    flip_sin_to_cos: bool = False,
    freq_shift: float = 1.0,
    max_period: float = 10000.0,
) -> jnp.ndarray:
    """Transformer sinusoidal timestep embedding.

    Matches diffusers get_timestep_embedding semantics (including the
    downscale_freq_shift denominator) so that positional time embeddings are
    numerically comparable with reference-trained models.
    """
    half_dim = dim // 2
    exponent = -math.log(max_period) * jnp.arange(half_dim, dtype=jnp.float32)
    exponent = exponent / (half_dim - freq_shift)
    emb = timesteps.astype(jnp.float32)[:, None] * jnp.exp(exponent)[None, :]
    emb = jnp.concatenate([jnp.sin(emb), jnp.cos(emb)], axis=-1)
    if flip_sin_to_cos:
        emb = jnp.concatenate([emb[:, half_dim:], emb[:, :half_dim]], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """Two-layer MLP lifting the sinusoidal embedding to time_embed_dim."""

    embed_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, temb: jnp.ndarray) -> jnp.ndarray:
        temb = nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_1")(temb)
        temb = nn.silu(temb)
        return nn.Dense(self.embed_dim, dtype=self.dtype, name="linear_2")(temb)


class GroupNormSiLU(nn.Module):
    """GroupNorm with an optional fused SiLU, lowered via the Pallas kernel.

    Param structure matches nn.GroupNorm ({scale, bias}), so checkpoints and
    converters are unaffected. On TPU this dispatches to
    ops.group_norm.group_norm_silu (one HBM read + one write per pass, f32
    statistics, out_dtype = the consuming conv's compute dtype); elsewhere it
    falls back to the exact XLA reference path. Emitting the conv input dtype
    directly is numerically identical to the unfused pipeline because nn.Conv
    promotes its input to the same dtype anyway.
    """

    groups: int = 32
    eps: float = 1e-6
    silu: bool = True
    dtype: jnp.dtype = jnp.float32  # output dtype

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        if os.environ.get("GADM_FUSED_GN", "1") != "1":
            # A/B lane: the pre-fusion lowering (f32 GN output, separate
            # SiLU), exactly what nn.GroupNorm(dtype=f32)+nn.silu produced.
            xf = x.astype(jnp.float32).reshape(
                x.shape[:-1] + (self.groups, c // self.groups)
            )
            red = tuple(range(1, x.ndim - 1)) + (x.ndim,)
            mean = jnp.mean(xf, axis=red, keepdims=True)
            var = jnp.maximum(
                jnp.mean(jnp.square(xf), axis=red, keepdims=True)
                - jnp.square(mean),
                0.0,
            )
            y = ((xf - mean) * jax.lax.rsqrt(var + self.eps)).reshape(x.shape)
            y = y * scale + bias
            return nn.silu(y) if self.silu else y
        return group_norm_silu(
            x, scale, bias, groups=self.groups, eps=self.eps, silu=self.silu,
            out_dtype=self.dtype,
        )


@jax.custom_vjp
def _conv1x1_mixed(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """1x1 conv with a conv forward and a matmul backward.

    Forward stays `conv_general_dilated` so XLA keeps fusing it with the
    residual add / surrounding elementwise (lowering the forward as a dot
    measured 702->663 passes/h on the CIFAR bench — see Conv1x1 below).
    Backward is expressed as einsums instead: under the ensemble vmap the
    kernel carries a leading member axis and XLA lowers the transposed-conv
    dgrad as a grouped convolution running at ~20 TFLOP/s on v5e
    (docs/profile_cifar_train.txt: the [8x64x32x32xC]*[1x1x8xCxD] rows,
    ~4.5% of the step), while the identical contraction as a batched dot
    runs at ~180. custom_vjp composes with vmap: the einsum rules batch
    over the member axis automatically.
    """
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
    )


def _conv1x1_mixed_fwd(x, kernel):
    return _conv1x1_mixed(x, kernel), (x, kernel)


def _conv1x1_mixed_bwd(res, dy):
    x, kernel = res
    k = kernel[0, 0]  # (Cin, Cout)
    dx = jnp.einsum("nhwd,cd->nhwc", dy, k).astype(x.dtype)
    dk = jnp.einsum("nhwc,nhwd->cd", x, dy).astype(kernel.dtype)
    return dx, dk[None, None]


_conv1x1_mixed.defvjp(_conv1x1_mixed_fwd, _conv1x1_mixed_bwd)


class Conv1x1(nn.Module):
    """1x1 convolution evaluated as a channel matmul.

    Param layout is identical to nn.Conv with a (1, 1) window (kernel
    (1, 1, in, out), bias (out,)) so checkpoints and the diffusers weight
    converters are unaffected; only the compute path differs. Motivation
    (docs/profile_cifar_train.txt): under the ensemble vmap the kernel gains
    a leading member axis and XLA lowers the (1, 1) conv as a grouped
    convolution running at 20-73 TFLOP/s on v5e, while the identical
    contraction expressed as a dot lowers to a batched matmul at ~180+.
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param(
                "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
            )
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        lane = os.environ.get("GADM_CONV1X1", "0")
        if lane == "1":
            y = jnp.einsum("...c,cd->...d", x, kernel[0, 0])
        elif lane == "mixed":
            # "mixed": conv forward (keeps the epilogue fusion), einsum
            # backward — built against the ~20 TFLOP/s grouped-conv dgrads
            # under the ensemble vmap (docs/profile_cifar_train.txt), but
            # MEASURED NEUTRAL-TO-WORSE on v5e: XLA lowers the vmapped
            # backward einsums as convert+multiply+reduce fusions rather
            # than MXU dots (a new 14% convert_reduce_fusion category,
            # ~equal to the grouped-conv time it replaced). Kept opt-in for
            # future XLA versions; see _conv1x1_mixed.
            y = _conv1x1_mixed(
                x.reshape((-1,) + x.shape[-3:]), kernel
            ).reshape(x.shape[:-1] + (self.features,))
        else:
            # Default lane: plain conv lowering fwd+bwd. Measured on v5e:
            # the full einsum lowering (GADM_CONV1X1=1) regresses the CIFAR
            # ensemble bench 702 -> 663 passes/h (XLA fuses the 1x1 conv
            # with the residual add and surrounding elementwise; the
            # dot_general form breaks that fusion), despite the grouped-conv
            # HLOs showing lower raw TFLOP/s.
            y = jax.lax.conv_general_dilated(
                x.reshape((-1,) + x.shape[-3:]), kernel, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).reshape(x.shape[:-1] + (self.features,))
        if bias is not None:
            y = y + bias
        return y


class ResnetBlock(nn.Module):
    """GN-SiLU-Conv resnet block with additive time conditioning.

    `hidden_channels` (conv1 out / conv2 in) is separate from `out_channels`
    so structural pruning can shrink the inner width without touching the
    block interface — the pruned model stays dense (SURVEY.md §2.6).
    """

    out_channels: int
    hidden_channels: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        temb: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        hidden_ch = self.hidden_channels or self.out_channels
        h = GroupNormSiLU(
            self.groups, eps=self.eps, dtype=self.dtype, name="norm1"
        )(x)
        # "remat_conv" tags feed UNet2D's selective remat_policy: a 3x3 conv
        # is the one op worth saving in the backward pass (recomputing it
        # costs real MXU FLOPs; the surrounding GN/SiLU are free to redo).
        h = checkpoint_name(
            nn.Conv(hidden_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h),
            "remat_conv",
        )

        if temb is not None:
            t = nn.Dense(hidden_ch, dtype=self.dtype, name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]

        h = GroupNormSiLU(
            self.groups, eps=self.eps, dtype=self.dtype, name="norm2"
        )(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = checkpoint_name(
            nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h),
            "remat_conv",
        )

        if x.shape[-1] != self.out_channels:
            x = Conv1x1(self.out_channels, dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class LoRADense(nn.Module):
    """Dense layer with an optional zero-cost LoRA side branch.

    Param structure is identical to nn.Dense ({kernel, bias}), so checkpoints
    and converters are unaffected. When the caller passes a "lora" variable
    collection (model.apply({"params": p, "lora": tree}, ...)) containing
    {down: (in, r), up: (r, out)} at this module's path, the output gains
    scale * (x @ down) @ up.

    This is the memory-critical path for ensemble LoRA training: merging
    (models.lora.lora_merge) materializes a full per-member copy of the 860M
    miniSD base (1.7 GB bf16 each) inside the train step, while the side
    branch adds only O(rank) compute and no parameter copies — the base stays
    a single shared buffer across all vmapped members (reference keeps LoRA
    separate for the same reason, text_to_image/train_text_to_image_lora.py:
    776-820).
    """

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32
    lora_scale: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (self.features,), jnp.float32)
            if self.use_bias
            else None
        )
        x, kernel, bias = nn.dtypes.promote_dtype(x, kernel, bias, dtype=self.dtype)
        y = x @ kernel
        if bias is not None:
            y = y + bias
        if self.has_variable("lora", "down"):
            down = self.get_variable("lora", "down").astype(y.dtype)
            up = self.get_variable("lora", "up").astype(y.dtype)
            y = y + self.lora_scale * ((x @ down) @ up)
        return y


class SelfAttention2D(nn.Module):
    """Spatial self-attention over HxW tokens with residual connection.

    head_dim=None means a single head of full channel width (the diffusers
    UNet2DModel attention_head_dim=None convention the CIFAR config uses,
    reference src/ddpm_config.py:53).
    """

    head_dim: Optional[int] = None
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        num_heads = 1 if self.head_dim is None else max(c // self.head_dim, 1)
        head_dim = c // num_heads

        residual = x
        y = GroupNormSiLU(
            self.groups, eps=self.eps, silu=False, dtype=self.dtype,
            name="group_norm",
        )(x)
        y = y.reshape(b, h * w, c)

        q = LoRADense(c, dtype=self.dtype, name="to_q")(y)
        k = LoRADense(c, dtype=self.dtype, name="to_k")(y)
        v = LoRADense(c, dtype=self.dtype, name="to_v")(y)

        q = q.reshape(b, h * w, num_heads, head_dim)
        k = k.reshape(b, h * w, num_heads, head_dim)
        v = v.reshape(b, h * w, num_heads, head_dim)
        y = dot_product_attention(q, k, v)
        y = y.reshape(b, h * w, c)

        y = LoRADense(c, dtype=self.dtype, name="to_out")(y)
        return residual + y.reshape(b, h, w, c)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(gate)


class CrossAttention(nn.Module):
    """Multi-head attention over (sequence, context) used by transformer blocks.

    `num_heads` follows the UNet2DConditionModel convention where the config's
    attention_head_dim is the head *count* (reference src/ddpm_config.py:550).
    Per-projection LoRA with heterogeneous q/k/v/out ranks attaches here via
    models.lora (replacing the reference's vendored diffusers module whose
    whole purpose was heterogeneous ranks, SURVEY.md §2.1).
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = x.shape[-1]
        head_dim = c // self.num_heads
        context = x if context is None else context

        q = LoRADense(c, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = LoRADense(c, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = LoRADense(c, use_bias=False, dtype=self.dtype, name="to_v")(context)

        b, n, _ = q.shape
        m = k.shape[1]
        q = q.reshape(b, n, self.num_heads, head_dim)
        k = k.reshape(b, m, self.num_heads, head_dim)
        v = v.reshape(b, m, self.num_heads, head_dim)
        out = dot_product_attention(q, k, v).reshape(b, n, c)
        return LoRADense(c, dtype=self.dtype, name="to_out")(out)


class TransformerBlock(nn.Module):
    """BasicTransformerBlock: self-attn, cross-attn, GEGLU feed-forward."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        h = nn.LayerNorm(dtype=jnp.float32, name="norm1")(x)
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn1")(h)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm2")(x)
        x = x + CrossAttention(self.num_heads, dtype=self.dtype, name="attn2")(h, context)
        h = nn.LayerNorm(dtype=jnp.float32, name="norm3")(x)
        h = GEGLU(c * 4, dtype=self.dtype, name="ff_geglu")(h)
        return x + nn.Dense(c, dtype=self.dtype, name="ff_out")(h)


class SpatialTransformer(nn.Module):
    """Transformer2DModel: GN, 1x1 proj in, transformer block(s), 1x1 proj out."""

    num_heads: int
    depth: int = 1
    groups: int = 32
    eps: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = GroupNormSiLU(
            self.groups, eps=self.eps, silu=False, dtype=self.dtype, name="norm"
        )(x)
        y = Conv1x1(c, dtype=self.dtype, name="proj_in")(y)
        y = y.reshape(b, h * w, c)
        for i in range(self.depth):
            y = TransformerBlock(self.num_heads, dtype=self.dtype, name=f"block_{i}")(
                y, context
            )
        y = y.reshape(b, h, w, c)
        y = Conv1x1(c, dtype=self.dtype, name="proj_out")(y)
        return residual + y


class Downsample(nn.Module):
    """Stride-2 conv downsample; padding=0 uses diffusers' asymmetric (0,1) pad."""

    out_channels: int
    padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.padding == 0:
            x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
            pad = "VALID"
        else:
            pad = self.padding
        return nn.Conv(
            self.out_channels, (3, 3), strides=(2, 2), padding=pad, dtype=self.dtype,
            name="conv",
        )(x)


class Upsample(nn.Module):
    """Nearest-neighbor 2x upsample followed by a 3x3 conv."""

    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
