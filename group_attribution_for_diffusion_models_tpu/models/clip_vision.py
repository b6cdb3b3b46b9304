"""Flax CLIP vision tower (ViT) + LAION aesthetic head.

Backs the CLIP-similarity, CLIP-prompt-score, and aesthetic model behaviors
(reference text_to_image/compute_model_behaviors.py:243-261,419-430;
src/aesthetics.py:8-27; attribution_utils.CLIPScore:80-163). ViT-L/14
geometry by default (SD 1.x's paired tower): 224px, 14px patches, width
1024, 24 layers, 16 heads, projection to 768.

The aesthetic model is the LAION linear head (768 -> 1) on the *normalized*
CLIP image embedding, exactly as `get_aesthetic_model` loads it.

Weights convert from local HF CLIPVisionModelWithProjection / aesthetic-head
state dicts (zero-egress image); random init keeps pipelines runnable.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .clip_text import CLIPLayer

# CLIP preprocessing constants (OpenAI).
CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class CLIPVisionEncoder(nn.Module):
    """Returns the projected, *unnormalized* image embedding (B, proj_dim)."""

    image_size: int = 224
    patch_size: int = 14
    width: int = 1024
    layers: int = 24
    heads: int = 16
    proj_dim: int = 768

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> jnp.ndarray:
        """images: (B, H, W, 3) in [0, 1]; resized + CLIP-normalized inside."""
        b = images.shape[0]
        x = jax.image.resize(
            images, (b, self.image_size, self.image_size, 3), "bilinear"
        )
        x = (x - CLIP_MEAN) / CLIP_STD

        x = nn.Conv(
            self.width,
            (self.patch_size, self.patch_size),
            strides=(self.patch_size, self.patch_size),
            use_bias=False,
            name="patch_embedding",
        )(x)
        n = (self.image_size // self.patch_size) ** 2
        x = x.reshape(b, n, self.width)

        cls = self.param("class_embedding", nn.initializers.normal(0.02), (self.width,))
        x = jnp.concatenate([jnp.broadcast_to(cls, (b, 1, self.width)), x], axis=1)
        pos = self.param(
            "position_embedding", nn.initializers.normal(0.02), (n + 1, self.width)
        )
        x = x + pos[None]
        x = nn.LayerNorm(epsilon=1e-5, name="pre_layernorm")(x)

        mask = jnp.zeros((1, 1, n + 1, n + 1))
        for i in range(self.layers):
            x = CLIPLayer(self.width, self.heads, name=f"layer_{i}")(x, mask)

        pooled = nn.LayerNorm(epsilon=1e-5, name="post_layernorm")(x[:, 0])
        return nn.Dense(self.proj_dim, use_bias=False, name="visual_projection")(pooled)


class AestheticHead(nn.Module):
    """LAION aesthetic predictor: Dense(768 -> 1) on the L2-normalized emb."""

    @nn.compact
    def __call__(self, embeddings: jnp.ndarray) -> jnp.ndarray:
        e = embeddings / jnp.maximum(
            jnp.linalg.norm(embeddings, axis=-1, keepdims=True), 1e-12
        )
        return nn.Dense(1, name="linear")(e)[:, 0]


def load_aesthetic_head(weights_path: Optional[str] = None, dim: int = 768):
    """(AestheticHead, variables) with the LAION linear-probe weights.

    Accepts either the original torch state dict (sa_0_4_vit_l_14_linear.pth
    — nn.Linear(768, 1) with weight (1, 768) / bias (1,), reference
    src/aesthetics.py:8-27) or an .npz with kernel (768, 1) / bias (1,).
    Random init without a path (scores then carry no aesthetic semantics)."""
    head = AestheticHead()
    if weights_path is None:
        variables = head.init(jax.random.PRNGKey(0), jnp.zeros((1, dim)))
        return head, variables
    if weights_path.endswith(".npz"):
        w = np.load(weights_path)
        kernel, bias = np.asarray(w["kernel"]), np.asarray(w["bias"])
    else:
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        kernel = np.asarray(sd["weight"]).T  # (1, dim) -> (dim, 1)
        bias = np.asarray(sd["bias"])
    if kernel.shape[0] != dim:
        raise ValueError(
            f"aesthetic head expects a ({dim}, 1) kernel, got {kernel.shape}"
        )
    variables = {
        "params": {"linear": {"kernel": jnp.asarray(kernel),
                              "bias": jnp.asarray(bias)}}
    }
    return head, variables


def make_embed_fn(model: CLIPVisionEncoder, variables, batch_size: int = 64):
    """Batched jitted embedding extractor over (N, H, W, 3) [0,1] arrays."""

    @jax.jit
    def _one(batch):
        return model.apply(variables, batch)

    def embed(images: np.ndarray) -> np.ndarray:
        outs = []
        for i in range(0, len(images), batch_size):
            outs.append(np.asarray(_one(jnp.asarray(images[i : i + batch_size]))))
        return np.concatenate(outs)

    return embed


def convert_clip_vision_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """HF CLIPVisionModelWithProjection state dict -> flax params."""
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
            put(["class_embedding"], v)
        elif key == "embeddings.patch_embedding.weight":
            put(["patch_embedding", "kernel"], v.transpose(2, 3, 1, 0))
        elif key == "embeddings.position_embedding.weight":
            put(["position_embedding"], v)
        elif key in ("pre_layrnorm.weight", "pre_layernorm.weight"):
            put(["pre_layernorm", "scale"], v)
        elif key in ("pre_layrnorm.bias", "pre_layernorm.bias"):
            put(["pre_layernorm", "bias"], v)
        elif key == "post_layernorm.weight":
            put(["post_layernorm", "scale"], v)
        elif key == "post_layernorm.bias":
            put(["post_layernorm", "bias"], v)
        elif key == "visual_projection.weight":
            put(["visual_projection", "kernel"], v.T)
        elif key.startswith("encoder.layers."):
            parts = key.split(".")
            i, rest = parts[2], parts[3:]
            base = [f"layer_{i}"]
            if rest[0] == "self_attn":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                put(base + ["self_attn", rest[1], leaf], v.T if leaf == "kernel" else v)
            elif rest[0] in ("layer_norm1", "layer_norm2"):
                put(base + [rest[0], "scale" if rest[1] == "weight" else "bias"], v)
            elif rest[0] == "mlp":
                leaf = "kernel" if rest[2] == "weight" else "bias"
                put(base + [rest[1], leaf], v.T if leaf == "kernel" else v)
    return p


def load_clip_vision(
    weights_path: Optional[str] = None, tiny: bool = False
):
    """(model, variables); `tiny` builds a small tower for smoke tests."""
    if tiny:
        model = CLIPVisionEncoder(
            image_size=32, patch_size=8, width=32, layers=2, heads=2, proj_dim=16
        )
    else:
        model = CLIPVisionEncoder()
    if weights_path is not None:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = convert_clip_vision_state_dict(
            {k: v.numpy() for k, v in sd.items()}
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
    return model, variables
