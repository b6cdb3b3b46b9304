"""Flax LDMBert text encoder (diffusers latent-diffusion layout).

The reference's imagenette workload conditions its LDM U-Net on
``pipeline.bert`` of CompVis/ldm-text2im-large-256 (reference
src/diffusion_utils.py:215-223) — diffusers' ``LDMBertModel``
(diffusers v0.24 pipelines/latent_diffusion/pipeline_latent_diffusion.py),
a BART-style post-LN transformer encoder with one LDM quirk: attention
width is ``head_dim * num_heads`` (64 * 8 = 512), PROJECTED DOWN from and
back up to d_model=1280 per block, with bias-free q/k/v. The pipeline calls
it without an attention mask (padding tokens attend), so this module does
the same.

Per-layer graph (LDMBertEncoderLayer):
    h = LN_attn(x + SelfAttn(x))          # post-LN, BART lineage
    h = LN_final(h + fc2(gelu(fc1(h))))
Encoder: tok_emb[ids] + pos_emb[arange] -> layers -> final layer_norm.

Weights convert from the torch ``LDMBertModel.state_dict()`` layout
(model.embed_tokens / model.embed_positions / model.layers.N.self_attn.*)
via `convert_ldm_bert_state_dict`; numeric parity with a torch oracle in
that exact layout is pinned in tests/test_convert_numeric.py. The unused
``to_logits`` head is dropped (the pipeline only reads hidden states).

Defaults mirror the ldm-text2im-large-256 config (vocab 30522, 77
positions, 32 layers, d_model 1280, 8 heads x head_dim 64, ffn 5120); every
field is overridable, and cli.convert_weights shape-checks a converted
checkpoint against the spec before writing.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class LDMBertSelfAttention(nn.Module):
    """num_heads x head_dim attention at inner width head_dim*num_heads."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        inner = self.num_heads * self.head_dim
        d_model = x.shape[-1]
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="v_proj")(x)

        b, s, _ = x.shape
        q = q.reshape(b, s, self.num_heads, self.head_dim) * (self.head_dim ** -0.5)
        k = k.reshape(b, s, self.num_heads, self.head_dim)
        v = v.reshape(b, s, self.num_heads, self.head_dim)
        scores = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        probs = nn.softmax(scores.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs, v).reshape(b, s, inner)
        return nn.Dense(d_model, dtype=self.dtype, name="out_proj")(out)


class LDMBertLayer(nn.Module):
    num_heads: int
    head_dim: int
    ffn_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = LDMBertSelfAttention(
            self.num_heads, self.head_dim, dtype=self.dtype, name="self_attn"
        )(x)
        x = nn.LayerNorm(dtype=jnp.float32, name="self_attn_layer_norm")(x + h)
        h = nn.Dense(self.ffn_dim, dtype=self.dtype, name="fc1")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(x.shape[-1], dtype=self.dtype, name="fc2")(h)
        return nn.LayerNorm(dtype=jnp.float32, name="final_layer_norm")(x + h)


class LDMBertEncoder(nn.Module):
    """Input (B, S) int token ids; returns (B, S, d_model) hidden states."""

    vocab_size: int = 30522
    max_positions: int = 77
    d_model: int = 1280
    layers: int = 32
    num_heads: int = 8
    head_dim: int = 64
    ffn_dim: int = 5120
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        tok = nn.Embed(self.vocab_size, self.d_model, name="embed_tokens")(input_ids)
        pos_table = self.param(
            "embed_positions",
            nn.initializers.normal(0.02),
            (self.max_positions, self.d_model),
            jnp.float32,
        )
        h = tok + pos_table[None, : input_ids.shape[1]]
        for i in range(self.layers):
            h = LDMBertLayer(
                self.num_heads, self.head_dim, self.ffn_dim, dtype=self.dtype,
                name=f"layer_{i}",
            )(h)
        return nn.LayerNorm(dtype=jnp.float32, name="layer_norm")(h)


def convert_ldm_bert_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """torch ``LDMBertModel.state_dict()`` -> flax params.

    Linear weights transpose (out, in) -> (in, out); embeddings copy as-is;
    the ``to_logits`` head is dropped. Accepts both the full-model layout
    (keys under ``model.``) and a bare-encoder layout.
    """
    params: Dict[str, Any] = {}

    def _set(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(value))

    for key, v in state_dict.items():
        v = np.asarray(getattr(v, "numpy", lambda: v)())
        parts = key.split(".")
        if parts[0] == "model":
            parts = parts[1:]
        if not parts or parts[0] == "to_logits":
            continue
        if parts[0] == "embed_tokens":
            _set(["embed_tokens", "embedding"], v)
        elif parts[0] == "embed_positions":
            _set(["embed_positions"], v)
        elif parts[0] == "layers":
            idx, rest, leaf = parts[1], parts[2:-1], parts[-1]
            mod = [f"layer_{idx}"] + rest
            if leaf == "weight" and v.ndim == 2:
                _set(mod + ["kernel"], v.T)
            elif leaf == "weight":  # LayerNorm scale
                _set(mod + ["scale"], v)
            else:
                _set(mod + ["bias"], v)
        elif parts[0] == "layer_norm":
            _set(["layer_norm", "scale" if parts[-1] == "weight" else "bias"], v)

    return params


def load_ldm_bert(weights_path: str) -> Dict:
    """Converted params from .npz (cli.convert_weights ldm_bert) or a torch
    state-dict file."""
    if weights_path.endswith(".npz"):
        from .clip_text import unflatten_params

        return unflatten_params(np.load(weights_path))
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_ldm_bert_state_dict(sd)
