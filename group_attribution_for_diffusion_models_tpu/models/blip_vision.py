"""Flax BLIP vision tower — the reference's diversity-embedding extractor.

The CelebA diversity behavior embeds images with the BLIP-VQA vision tower
before Ward clustering (reference src/attributions/global_scores/
diversity_score.py:89-91). This is that tower TPU-native: a ViT with fused
qkv attention, exact-GELU MLP, and a post-layernorm CLS pooler, matching HF
`BlipVisionModel` layer for layer (blip-vqa-base geometry: 384px, 16px
patches, width 768, 12 layers, 12 heads).

Weights convert from a local HF BlipVisionModel state dict via
`convert_blip_vision_state_dict`; numerical parity with the torch forward is
tested in tests/test_convert_numeric.py on random weights.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip_vision import CLIP_MEAN, CLIP_STD  # BLIP uses the same stats


class BlipAttention(nn.Module):
    width: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, n, _ = x.shape
        head_dim = self.width // self.heads
        qkv = nn.Dense(3 * self.width, name="qkv")(x)
        qkv = qkv.reshape(b, n, 3, self.heads, head_dim)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = (q @ k.transpose(0, 1, 3, 2)) * (head_dim**-0.5)
        attn = jax.nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(b, n, self.width)
        return nn.Dense(self.width, name="projection")(out)


class BlipLayer(nn.Module):
    width: int
    heads: int
    mlp_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm1")(x)
        x = x + BlipAttention(self.width, self.heads, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, name="layer_norm2")(x)
        h = nn.Dense(self.mlp_dim, name="fc1")(h)
        h = jax.nn.gelu(h, approximate=False)
        return x + nn.Dense(self.width, name="fc2")(h)


class BlipVisionTower(nn.Module):
    """Returns the pooled CLS embedding (B, width) of [0, 1] images."""

    image_size: int = 384
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_dim: int = 3072

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        b = images.shape[0]
        x = jax.image.resize(
            images, (b, self.image_size, self.image_size, 3), "bilinear"
        )
        x = (x - CLIP_MEAN) / CLIP_STD

        x = nn.Conv(
            self.width, (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size), name="patch_embedding",
        )(x)
        n = (self.image_size // self.patch_size) ** 2
        x = x.reshape(b, n, self.width)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)), x], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n + 1, self.width))
        x = x + pos[None]
        for i in range(self.layers):
            x = BlipLayer(self.width, self.heads, self.mlp_dim,
                          name=f"layer_{i}")(x)
        x = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x)
        return x[:, 0]


def convert_blip_vision_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """HF BlipVisionModel state dict -> this module's flax params."""
    p: Dict[str, Any] = {}

    def put(path: List[str], v):
        node = p
        for part in path[:-1]:
            node = node.setdefault(part, {})
        node[path[-1]] = np.asarray(v)

    for key, v in state_dict.items():
        v = np.asarray(v)
        key = key.replace("vision_model.", "")
        if key == "embeddings.class_embedding":
            put(["class_embedding"], v.reshape(-1))
        elif key == "embeddings.position_embedding":
            put(["position_embedding"], v.reshape(v.shape[-2], v.shape[-1]))
        elif key == "embeddings.patch_embedding.weight":
            put(["patch_embedding", "kernel"], v.transpose(2, 3, 1, 0))
        elif key == "embeddings.patch_embedding.bias":
            put(["patch_embedding", "bias"], v)
        elif key == "post_layernorm.weight":
            put(["post_layernorm", "scale"], v)
        elif key == "post_layernorm.bias":
            put(["post_layernorm", "bias"], v)
        elif key.startswith("encoder.layers."):
            parts = key.split(".")
            i, rest = parts[2], parts[3:]
            base = [f"layer_{i}"]
            if rest[0] == "self_attn":
                leaf = "kernel" if rest[-1] == "weight" else "bias"
                put(base + ["self_attn", rest[1], leaf],
                    v.T if leaf == "kernel" else v)
            elif rest[0] in ("layer_norm1", "layer_norm2"):
                put(base + [rest[0], "scale" if rest[1] == "weight" else "bias"], v)
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[-1] == "weight" else "bias"
                put(base + [rest[1], leaf], v.T if leaf == "kernel" else v)
    return p


def load_blip_vision(weights_path: Optional[str] = None, tiny: bool = False):
    """(model, variables); `tiny` builds a small tower for smoke tests."""
    if tiny:
        model = BlipVisionTower(image_size=32, patch_size=8, width=32,
                                layers=2, heads=2, mlp_dim=64)
    else:
        model = BlipVisionTower()
    if weights_path is not None:
        if weights_path.endswith(".npy"):  # already-converted param tree
            params = np.load(weights_path, allow_pickle=True).item()
        else:  # raw torch state dict
            import torch

            sd = torch.load(weights_path, map_location="cpu")
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            params = convert_blip_vision_state_dict(
                {k: np.asarray(v) for k, v in sd.items()}
            )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    else:
        variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        print("WARNING: BLIP tower running random-init (no weights); "
              "embeddings are not reference-comparable")
    return model, variables
