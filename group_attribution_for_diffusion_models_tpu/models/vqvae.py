"""Flax VQ-VAE (diffusers VQModel) for latent diffusion.

The CelebA-HQ LDM workload trains its U-Net in the continuous latent space
of a frozen VQ-VAE (reference src/ddpm_config.py:462-483 ``vqvae_config``,
CompVis/ldm-celebahq-256): 256x256x3 images encode to 64x64x3 latents
(f=4 downsampling), the U-Net diffuses those, and decoding quantizes against
the 8192-entry codebook before the decoder (diffusers
VQModel.decode(force_not_quantize=False)).

TPU-first design notes:
* `encode` / `decode` are plain jittable methods; the reference's one-time
  full-dataset latent precompute (reference unconditional_generation/
  main.py:490-546) becomes `precompute_latents` — one batched XLA program,
  cached to disk keyed by image index.
* The codebook lookup is an argmin over squared distances — one (N, K)
  matmul on the MXU.
* Pretrained weights convert from a local diffusers VQModel state dict via
  `convert_vqvae_state_dict` (no egress in this image; random init otherwise).
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..config.registry import VQVAESpec
from .layers import GroupNormSiLU, ResnetBlock, SelfAttention2D


class Encoder(nn.Module):
    spec: VQVAESpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        h = nn.Conv(spec.block_out_channels[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x)
        for i, ch in enumerate(spec.block_out_channels):
            for j in range(spec.layers_per_block):
                h = ResnetBlock(
                    ch, groups=spec.norm_num_groups, dtype=self.dtype,
                    name=f"down_{i}_res_{j}",
                )(h)
            if i < len(spec.block_out_channels) - 1:
                # Asymmetric (0,1) pad + VALID stride-2 conv halves exactly.
                h = jnp.pad(h, ((0, 0), (0, 1), (0, 1), (0, 0)))
                h = nn.Conv(ch, (3, 3), strides=(2, 2), padding="VALID",
                            dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = spec.block_out_channels[-1]
        h = ResnetBlock(ch, groups=spec.norm_num_groups, dtype=self.dtype,
                        name="mid_res_0")(h)
        h = SelfAttention2D(groups=spec.norm_num_groups, dtype=self.dtype,
                            name="mid_attn")(h)
        h = ResnetBlock(ch, groups=spec.norm_num_groups, dtype=self.dtype,
                        name="mid_res_1")(h)
        h = GroupNormSiLU(spec.norm_num_groups, eps=1e-6, dtype=self.dtype,
                          name="norm_out")(h)
        return nn.Conv(spec.latent_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class Decoder(nn.Module):
    spec: VQVAESpec
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        spec = self.spec
        reversed_ch = tuple(reversed(spec.block_out_channels))
        h = nn.Conv(reversed_ch[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z)
        ch = reversed_ch[0]
        h = ResnetBlock(ch, groups=spec.norm_num_groups, dtype=self.dtype,
                        name="mid_res_0")(h)
        h = SelfAttention2D(groups=spec.norm_num_groups, dtype=self.dtype,
                            name="mid_attn")(h)
        h = ResnetBlock(ch, groups=spec.norm_num_groups, dtype=self.dtype,
                        name="mid_res_1")(h)
        for i, ch in enumerate(reversed_ch):
            for j in range(spec.layers_per_block + 1):
                h = ResnetBlock(ch, groups=spec.norm_num_groups, dtype=self.dtype,
                                name=f"up_{i}_res_{j}")(h)
            if i < len(reversed_ch) - 1:
                b, hh, ww, cc = h.shape
                h = jax.image.resize(h, (b, hh * 2, ww * 2, cc), "nearest")
                h = nn.Conv(ch, (3, 3), padding=1, dtype=self.dtype,
                            name=f"up_{i}_upsample")(h)
        h = GroupNormSiLU(spec.norm_num_groups, eps=1e-6, dtype=self.dtype,
                          name="norm_out")(h)
        return nn.Conv(spec.out_channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv_out")(h)


class VQVAE(nn.Module):
    """VQModel: encoder -> quant_conv -> [codebook] -> post_quant_conv -> decoder."""

    spec: VQVAESpec
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.spec, self.dtype)
        self.decoder = Decoder(self.spec, self.dtype)
        self.quant_conv = nn.Conv(self.spec.latent_channels, (1, 1), name="quant_conv")
        self.post_quant_conv = nn.Conv(
            self.spec.latent_channels, (1, 1), name="post_quant_conv"
        )
        self.codebook = self.param(
            "codebook",
            nn.initializers.uniform(scale=1.0),
            (self.spec.num_vq_embeddings, self.spec.latent_channels),
        )

    def encode(self, x: jnp.ndarray) -> jnp.ndarray:
        """Continuous (pre-quantization) latents — the diffusion space."""
        return self.quant_conv(self.encoder(x))

    def quantize(self, z: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Nearest codebook entry per latent vector: one MXU matmul argmin."""
        flat = z.reshape(-1, z.shape[-1])
        d = (
            jnp.sum(flat**2, axis=1, keepdims=True)
            - 2.0 * flat @ self.codebook.T
            + jnp.sum(self.codebook**2, axis=1)[None, :]
        )
        idx = jnp.argmin(d, axis=1)
        quantized = self.codebook[idx].reshape(z.shape)
        return quantized, idx.reshape(z.shape[:-1])

    def decode(self, z: jnp.ndarray, force_not_quantize: bool = False) -> jnp.ndarray:
        if not force_not_quantize:
            z, _ = self.quantize(z)
        return self.decoder(self.post_quant_conv(z))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))


class AutoencoderKL(nn.Module):
    """KL VAE (SD 1.x): encoder emits (mean, logvar); decode is deterministic.

    The SD LoRA path encodes images as ``mean + std * eps`` scaled by
    `spec.scaling_factor` (reference train_text_to_image_lora.py:1220-1223).
    Reuses the VQ encoder/decoder stacks; only the latent head differs.
    """

    spec: Any  # KLVAESpec
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        from ..config.registry import VQVAESpec

        inner = VQVAESpec(
            sample_size=self.spec.sample_size,
            in_channels=self.spec.in_channels,
            out_channels=self.spec.out_channels,
            latent_channels=2 * self.spec.latent_channels,  # mean + logvar
            block_out_channels=tuple(self.spec.block_out_channels),
            layers_per_block=self.spec.layers_per_block,
            norm_num_groups=self.spec.norm_num_groups,
        )
        dec_spec = VQVAESpec(
            sample_size=self.spec.sample_size,
            in_channels=self.spec.in_channels,
            out_channels=self.spec.out_channels,
            latent_channels=self.spec.latent_channels,
            block_out_channels=tuple(self.spec.block_out_channels),
            layers_per_block=self.spec.layers_per_block,
            norm_num_groups=self.spec.norm_num_groups,
        )
        self.encoder = Encoder(inner, self.dtype)
        self.decoder = Decoder(dec_spec, self.dtype)
        self.quant_conv = nn.Conv(
            2 * self.spec.latent_channels, (1, 1), name="quant_conv"
        )
        self.post_quant_conv = nn.Conv(
            self.spec.latent_channels, (1, 1), name="post_quant_conv"
        )

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def encode(self, x: jnp.ndarray, key: Optional[jax.Array] = None) -> jnp.ndarray:
        """Sampled (or mean, if key=None) latents, scaling applied."""
        mean, logvar = self.encode_moments(x)
        if key is not None:
            mean = mean + jnp.exp(0.5 * logvar) * jax.random.normal(key, mean.shape)
        return mean * self.spec.scaling_factor

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(self.post_quant_conv(z / self.spec.scaling_factor))

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.decode(self.encode(x))


def load_vqvae(
    spec: VQVAESpec, weights_path: Optional[str] = None, quiet: bool = False
) -> Tuple[VQVAE, Any]:
    """(model, variables) for the frozen VQ-VAE of an LDM workload.

    Weights come from a converted diffusers VQModel state dict
    (cli.convert_weights); without them the model is deterministically
    random-initialized (PRNGKey(7), same as the trainer) so smoke runs use
    one consistent encoder/decoder across train -> sample -> score.
    """
    vqvae = VQVAE(spec)
    if weights_path:
        variables = {"params": np.load(weights_path, allow_pickle=True).item()}
    else:
        variables = vqvae.init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels)),
        )
        if not quiet:
            print(
                "WARNING: VQ-VAE running random-init (no vqvae weights); "
                "outputs are not reference-comparable"
            )
    return vqvae, variables


def make_vq_decode_fn(
    spec: VQVAESpec, weights_path: Optional[str] = None, quiet: bool = False
):
    """Jittable decode_fn: scaled U-Net latents -> [-1, 1] images.

    Undoes the training-time `* scaling_factor` (cli.main) and runs
    quantize -> post_quant_conv -> decoder — the step the reference gets from
    LDMPipeline's vqvae.decode after the denoise loop (reference
    src/diffusion_utils.py:253-276).
    """
    vqvae, variables = load_vqvae(spec, weights_path, quiet=quiet)
    scale = spec.scaling_factor

    def decode_fn(z: jnp.ndarray) -> jnp.ndarray:
        return vqvae.apply(variables, z / scale, method=vqvae.decode)

    return decode_fn


def precompute_latents(
    vqvae: VQVAE,
    variables,
    images: np.ndarray,
    batch_size: int = 64,
    cache_path: Optional[str] = None,
) -> np.ndarray:
    """Encode the whole dataset once; cache keyed by image index.

    Replaces the reference's torch dict-by-imageid precompute
    (reference main.py:515-530) with one array aligned to dataset order.
    """
    import os

    if cache_path is not None and os.path.exists(cache_path):
        return np.load(cache_path)

    @jax.jit
    def enc(batch):
        return vqvae.apply(variables, batch, method=vqvae.encode)

    outs = []
    for i in range(0, len(images), batch_size):
        outs.append(np.asarray(enc(jnp.asarray(images[i : i + batch_size]))))
    latents = np.concatenate(outs)
    if cache_path is not None:
        os.makedirs(os.path.dirname(os.path.abspath(cache_path)), exist_ok=True)
        np.save(cache_path, latents)
    return latents


def load_sd_vae(spec, weights_path: Optional[str] = None, quiet: bool = False):
    """(model, variables) for the SD AutoencoderKL.

    The no-weights random init is deterministically seeded (PRNGKey(2), the
    LoRA trainer's seed) so EVERY consumer — trainer latent precompute, TRAK
    feature extraction, behavior-scoring decode — shares one encoder/decoder
    in smoke runs; a mismatched tower would silently score/differentiate a
    latent space the model was never trained in.
    """
    model = AutoencoderKL(spec)
    if weights_path:
        variables = {"params": np.load(weights_path, allow_pickle=True).item()}
    else:
        variables = model.init(
            jax.random.PRNGKey(2),
            jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels)),
        )
        if not quiet:
            print("WARNING: SD VAE running random-init (no weights); "
                  "outputs are not reference-comparable")
    return model, variables
