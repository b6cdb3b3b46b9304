"""Flax CLIP text encoder for the Stable-Diffusion (miniSD) path.

The reference loads HF CLIPTextModel for SD LoRA training (reference
text_to_image/train_text_to_image_lora.py:719-744) and for CLIP-similarity
behaviors. This is a from-scratch Flax implementation of the SD 1.x text
tower (CLIP ViT-L/14: vocab 49408, context 77, width 768, 12 layers, 12
heads, quick-GELU, causal mask, final LN) that compiles into the same XLA
graph as the U-Net step — so text conditioning adds no host round-trips.

Weights convert from a locally available torch CLIPTextModel state dict via
`convert_clip_text_state_dict` (zero-egress image: downloads are the user's
job; random init keeps pipelines runnable).

Tokenization: the real CLIP BPE needs vocab/merges files. `load_tokenizer`
uses them when present (via tokenizers/transformers if installed);
`HashTokenizer` is the deterministic fallback for smoke tests — stable
whitespace-token hashing into the vocab range, bracketed by BOS/EOS like
CLIP's padding scheme.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class CLIPTextConfig:
    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12

    def __init__(self, **kw):
        for k, v in kw.items():
            setattr(self, k, v)


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class CLIPAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
        head_dim = self.width // self.heads
        b, n, _ = x.shape
        q = nn.Dense(self.width, name="q_proj")(x) * (head_dim**-0.5)
        k = nn.Dense(self.width, name="k_proj")(x)
        v = nn.Dense(self.width, name="v_proj")(x)
        q = q.reshape(b, n, self.heads, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(b, n, self.heads, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, self.heads, head_dim).transpose(0, 2, 1, 3)
        attn = q @ k.transpose(0, 1, 3, 2) + mask
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, self.width)
        return nn.Dense(self.width, name="out_proj")(out)


class CLIPLayer(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x, mask):
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + CLIPAttention(self.width, self.heads, name="self_attn")(h, mask)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.width * 4, name="fc1")(h)
        h = quick_gelu(h)
        x = x + nn.Dense(self.width, name="fc2")(h)
        return x


class CLIPTextEncoder(nn.Module):
    """Returns last_hidden_state (B, 77, width) — the SD conditioning."""

    vocab_size: int = 49408
    max_length: int = 77
    width: int = 768
    layers: int = 12
    heads: int = 12

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        b, n = input_ids.shape
        tok = nn.Embed(self.vocab_size, self.width, name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (self.max_length, self.width),
        )
        x = tok + pos[None, :n]
        causal = jnp.triu(jnp.full((n, n), -1e9), k=1)[None, None]
        for i in range(self.layers):
            x = CLIPLayer(self.width, self.heads, name=f"layer_{i}")(x, causal)
        return nn.LayerNorm(epsilon=1e-5, name="final_layer_norm")(x)


class HashTokenizer:
    """Deterministic fallback tokenizer: stable token hashing + BOS/EOS/pad."""

    bos_id = 49406
    eos_id = 49407

    def __init__(self, vocab_size: int = 49408, max_length: int = 77):
        self.vocab_size = vocab_size
        self.max_length = max_length

    def __call__(self, texts: Sequence[str]) -> np.ndarray:
        import hashlib

        out = np.full((len(texts), self.max_length), self.eos_id, np.int32)
        for row, text in enumerate(texts):
            ids = [self.bos_id]
            for word in text.lower().split()[: self.max_length - 2]:
                h = int(hashlib.md5(word.encode()).hexdigest(), 16)
                ids.append(h % (self.vocab_size - 2))
            ids.append(self.eos_id)
            out[row, : len(ids)] = ids
        return out


def load_tokenizer(vocab_dir: Optional[str] = None, max_length: int = 77):
    """Real CLIP BPE when vocab files exist locally, else HashTokenizer.

    Uses the in-repo pure-Python byte-pair encoder (models.clip_tokenizer,
    parity-tested against transformers.CLIPTokenizer) — no transformers
    dependency at runtime."""
    if vocab_dir is not None:
        # An explicitly requested vocab must load — silently falling back to
        # the hash tokenizer would feed arbitrary ids to real embeddings.
        from .clip_tokenizer import CLIPBPETokenizer

        return CLIPBPETokenizer.from_dir(vocab_dir, max_length=max_length)
    return HashTokenizer(max_length=max_length)


def unflatten_params(flat) -> Dict:
    """'/'-joined flat mapping (cli.convert_weights .npz layout) -> nested."""
    nested: Dict[str, Any] = {}
    for key in flat.keys() if hasattr(flat, "keys") else flat:
        node = nested
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return nested


def load_clip_text(weights_path: str) -> Dict:
    """Converted CLIP text params from a .npz (cli.convert_weights clip_text)
    or directly from a torch CLIPTextModel state-dict file."""
    if weights_path.endswith(".npz"):
        return unflatten_params(np.load(weights_path))
    import torch

    sd = torch.load(weights_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return jax.tree_util.tree_map(
        jnp.asarray,
        convert_clip_text_state_dict({k: np.asarray(v) for k, v in sd.items()}),
    )


def convert_clip_text_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """HF CLIPTextModel state dict -> this module's flax params."""
    p: Dict[str, Any] = {}

    def put(path: List[str], v):
        node = p
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = np.asarray(v)

    for key, v in state_dict.items():
        v = np.asarray(v)
        key = key.replace("text_model.", "")
        if key == "embeddings.token_embedding.weight":
            put(["token_embedding", "embedding"], v)
        elif key == "embeddings.position_embedding.weight":
            put(["position_embedding"], v)
        elif key.startswith("encoder.layers."):
            parts = key.split(".")
            i = parts[2]
            rest = parts[3:]
            base = [f"layer_{i}"]
            if rest[0] == "self_attn":
                proj = rest[1]
                leaf = "kernel" if rest[2] == "weight" else "bias"
                val = v.T if leaf == "kernel" else v
                put(base + ["self_attn", proj, leaf], val)
            elif rest[0] in ("layer_norm1", "layer_norm2"):
                leaf = "scale" if rest[1] == "weight" else "bias"
                put(base + [rest[0], leaf], v)
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                val = v.T if leaf == "kernel" else v
                put(base + [rest[1], leaf], val)
        elif key == "final_layer_norm.weight":
            put(["final_layer_norm", "scale"], v)
        elif key == "final_layer_norm.bias":
            put(["final_layer_norm", "bias"], v)
    return p
