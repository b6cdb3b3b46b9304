"""UNet2D noise-prediction model (Flax linen, NHWC).

One model class covers both the unconditional UNet2DModel configs (CIFAR /
MNIST / CelebA LDM — reference src/ddpm_config.py:48-100,421-451) and the
cross-attention UNet2DConditionModel configs (Imagenette LDM / miniSD —
reference src/ddpm_config.py:542-575), selected by the block-type strings in
`UNetSpec`. Architecture is driven entirely by the spec, so structural
pruning is a `UNetSpec -> UNetSpec` transform (per-resnet hidden-channel
overrides in `spec.pruned_channels`) and pruned models re-instantiate dense —
never pickled modules (the reference pickles whole pruned nn.Modules,
reference unconditional_generation/prune.py:415-421; SURVEY.md §5.4).

Skip-connection bookkeeping mirrors the diffusers wiring (push after conv_in,
after every resnet, and after every downsample; up-blocks concat-pop in
reverse), so channel counts line up exactly with reference-trained
checkpoints for weight conversion.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from ..config.registry import UNetSpec
from .layers import (
    Downsample,
    GroupNormSiLU,
    ResnetBlock,
    SelfAttention2D,
    SpatialTransformer,
    TimestepEmbedding,
    TimestepEmbedding as _TE,  # noqa: F401  (re-export convenience)
    Upsample,
    sinusoidal_embedding,
)

_DOWN_TYPES = {"DownBlock2D", "AttnDownBlock2D", "CrossAttnDownBlock2D"}
_UP_TYPES = {"UpBlock2D", "AttnUpBlock2D", "CrossAttnUpBlock2D"}


def _resolve_remat_policy(name: Optional[str]):
    """Map a UNet2D.remat_policy string to a jax.checkpoint policy."""
    import jax

    cp = jax.checkpoint_policies
    if name is None or name == "full":
        return None
    if name == "convs":
        return cp.save_only_these_names("remat_conv")
    if name == "convs_dots":
        return cp.save_from_both_policies(
            cp.save_only_these_names("remat_conv"),
            cp.dots_with_no_batch_dims_saveable,
        )
    raise ValueError(
        f"unknown remat_policy {name!r}; expected full|convs|convs_dots"
    )


class UNet2D(nn.Module):
    """Noise-prediction U-Net. Input/output NHWC; timesteps shape (B,)."""

    spec: UNetSpec
    dtype: jnp.dtype = jnp.float32
    # Rematerialize resnet blocks in the backward pass: trades ~1/3 more FLOPs
    # for O(depth) less activation HBM — the jax.checkpoint lever that lets
    # large ensembles of members train concurrently on one chip.
    remat: bool = False
    # Selective-remat policy (only meaningful with remat=True):
    #   None/"full"  — save nothing per block; backward recomputes the whole
    #                  block forward (max memory savings, ~+1/3 FLOPs).
    #   "convs"      — save the 3x3 conv outputs ("remat_conv" tags in
    #                  layers.ResnetBlock); backward recomputes only the
    #                  norms/activations/attention of each block. Cuts the
    #                  recompute FLOPs where they are (convs are the FLOPs
    #                  in these U-Nets) at ~2 saved tensors per resnet.
    #   "convs_dots" — additionally save every no-batch-dim dot (all Dense /
    #                  q/k/v/GEGLU projections); recompute is elementwise
    #                  only, memory approaches no-remat.
    remat_policy: Optional[str] = None

    def _hidden(self, path: str) -> Optional[int]:
        """Pruned hidden-width override for a resnet block, if any."""
        if self.spec.pruned_channels is None:
            return None
        return self.spec.pruned_channels.get(path)

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        timesteps: jnp.ndarray,
        encoder_hidden_states: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        spec = self.spec
        if timesteps.ndim == 0:
            timesteps = jnp.broadcast_to(timesteps, (x.shape[0],))

        temb = sinusoidal_embedding(
            timesteps,
            spec.block_out_channels[0],
            flip_sin_to_cos=spec.flip_sin_to_cos,
            freq_shift=spec.freq_shift,
        )
        temb = TimestepEmbedding(
            spec.block_out_channels[0] * 4, dtype=self.dtype, name="time_embedding"
        )(temb)

        # Remat covers every block type: the transformer blocks' GEGLU/ff
        # activations (seq x 4*channels bf16 per block) dominate HBM at
        # ensemble batch sizes, not the resnets.
        if self.remat:
            policy = _resolve_remat_policy(self.remat_policy)
            remat_kwargs = {} if policy is None else {"policy": policy}
            resnet_cls = nn.remat(ResnetBlock, **remat_kwargs)
            self_attn_cls = nn.remat(SelfAttention2D, **remat_kwargs)
            xattn_cls = nn.remat(SpatialTransformer, **remat_kwargs)
        else:
            resnet_cls = ResnetBlock
            self_attn_cls = SelfAttention2D
            xattn_cls = SpatialTransformer

        def resnet(path: str, out_ch: int):
            return resnet_cls(
                out_channels=out_ch,
                hidden_channels=self._hidden(path),
                groups=spec.norm_num_groups,
                eps=spec.norm_eps,
                dropout=spec.dropout,
                dtype=self.dtype,
                name=path,
            )

        def self_attn(path: str):
            return self_attn_cls(
                head_dim=spec.attention_head_dim,
                groups=spec.norm_num_groups,
                eps=spec.norm_eps,
                dtype=self.dtype,
                name=path,
            )

        def cross_attn(path: str):
            # UNet2DConditionModel convention: attention_head_dim is the head
            # count (reference src/ddpm_config.py:550).
            return xattn_cls(
                num_heads=spec.attention_head_dim or 8,
                groups=spec.norm_num_groups,
                eps=spec.norm_eps,
                dtype=self.dtype,
                name=path,
            )

        h = nn.Conv(
            spec.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
            name="conv_in",
        )(x)

        skips = [h]
        out_ch = spec.block_out_channels[0]
        for i, block_type in enumerate(spec.down_block_types):
            if block_type not in _DOWN_TYPES:
                raise ValueError(f"unknown down block {block_type!r}")
            out_ch = spec.block_out_channels[i]
            is_final = i == len(spec.down_block_types) - 1
            for j in range(spec.layers_per_block):
                h = resnet(f"down_{i}_res_{j}", out_ch)(h, temb, deterministic)
                if block_type == "AttnDownBlock2D":
                    h = self_attn(f"down_{i}_attn_{j}")(h)
                elif block_type == "CrossAttnDownBlock2D":
                    h = cross_attn(f"down_{i}_xattn_{j}")(h, encoder_hidden_states)
                skips.append(h)
            if not is_final:
                h = Downsample(
                    out_ch, padding=spec.downsample_padding, dtype=self.dtype,
                    name=f"down_{i}_downsample",
                )(h)
                skips.append(h)

        # Mid block.
        h = resnet("mid_res_0", spec.block_out_channels[-1])(h, temb, deterministic)
        if spec.conditional:
            h = cross_attn("mid_xattn")(h, encoder_hidden_states)
        elif spec.add_attention:
            h = self_attn("mid_attn")(h)
        h = resnet("mid_res_1", spec.block_out_channels[-1])(h, temb, deterministic)

        # Up path.
        reversed_ch = tuple(reversed(spec.block_out_channels))
        for i, block_type in enumerate(spec.up_block_types):
            if block_type not in _UP_TYPES:
                raise ValueError(f"unknown up block {block_type!r}")
            out_ch = reversed_ch[i]
            is_final = i == len(spec.up_block_types) - 1
            for j in range(spec.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip], axis=-1)
                h = resnet(f"up_{i}_res_{j}", out_ch)(h, temb, deterministic)
                if block_type == "AttnUpBlock2D":
                    h = self_attn(f"up_{i}_attn_{j}")(h)
                elif block_type == "CrossAttnUpBlock2D":
                    h = cross_attn(f"up_{i}_xattn_{j}")(h, encoder_hidden_states)
            if not is_final:
                h = Upsample(out_ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)

        h = GroupNormSiLU(
            spec.norm_num_groups, eps=spec.norm_eps, dtype=self.dtype,
            name="conv_norm_out",
        )(h)
        h = nn.Conv(
            spec.out_channels, (3, 3), padding=1, dtype=self.dtype, name="conv_out"
        )(h)
        return h.astype(jnp.float32)
