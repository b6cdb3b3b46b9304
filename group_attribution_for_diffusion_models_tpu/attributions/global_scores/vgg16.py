"""Flax VGG16 feature tower for precision/recall.

The reference's P&R manifolds are built on the NVIDIA StyleGAN2 VGG16
feature extractor (reference src/attributions/global_scores/
precision_recall.py:31-51: torch.jit model, `return_features=True` -> the
4096-d fc2 activations). That TorchScript bundle is a port of the classic
caffe VGG16; this module re-creates the tower natively — 13 conv layers in
five pooled stages, then fc1 -> ReLU -> fc2, returning the fc2 features —
so manifold features come from one jittable XLA program.

Weights convert from a torchvision-style `vgg16` state dict
(features.N.weight / classifier.{0,3}.*) via `convert_vgg16_state_dict`;
numeric parity with the torch forward is pinned in
tests/test_vgg16_numeric.py. Preprocessing follows the caffe/StyleGAN
convention by default (RGB in [0,1] -> x*255 - ImageNet mean pixel, no std
division); pass preprocess="torchvision" for torchvision-trained weights
(ImageNet mean/std on [0,1] inputs).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# Stage widths of VGG16; each stage is a run of 3x3 convs followed by a
# stride-2 max pool. (64,64), (128,128), (256,)*3, (512,)*3, (512,)*3.
VGG16_STAGES: Tuple[Tuple[int, ...], ...] = (
    (64, 64), (128, 128), (256, 256, 256), (512, 512, 512), (512, 512, 512)
)

_CAFFE_MEAN = np.array([123.68, 116.779, 103.939], np.float32)
_TV_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_TV_STD = np.array([0.229, 0.224, 0.225], np.float32)


class VGG16Features(nn.Module):
    """Input NHWC RGB in [0, 1]; returns the 4096-d fc2 feature vector."""

    stages: Tuple[Tuple[int, ...], ...] = VGG16_STAGES
    fc_dim: int = 4096
    input_size: int = 224
    preprocess: str = "caffe"  # "caffe" (StyleGAN2 metrics) | "torchvision" | "none"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b = x.shape[0]
        if x.shape[1] != self.input_size or x.shape[2] != self.input_size:
            x = jax.image.resize(
                x, (b, self.input_size, self.input_size, x.shape[-1]), "bilinear"
            )
        if self.preprocess == "caffe":
            x = x * 255.0 - _CAFFE_MEAN
        elif self.preprocess == "torchvision":
            x = (x - _TV_MEAN) / _TV_STD

        idx = 0
        for stage in self.stages:
            for ch in stage:
                x = nn.relu(
                    nn.Conv(ch, (3, 3), padding=1, name=f"conv_{idx}")(x)
                )
                idx += 1
            x = nn.max_pool(x, (2, 2), strides=(2, 2))

        # torch flattens NCHW (C, H, W); match that order so converted fc1
        # weights line up.
        x = jnp.transpose(x, (0, 3, 1, 2)).reshape(b, -1)
        x = nn.relu(nn.Dense(self.fc_dim, name="fc1")(x))
        return nn.Dense(self.fc_dim, name="fc2")(x)


def convert_vgg16_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """torchvision-style vgg16 state dict -> VGG16Features params.

    features.{0,2,5,7,10,12,14,17,19,21,24,26,28} -> conv_0..conv_12 (in
    order); classifier.0 -> fc1, classifier.3 -> fc2. classifier.6 (the
    1000-way head) is dropped — P&R uses fc2 features.
    """
    conv_keys = sorted(
        {
            int(k.split(".")[1])
            for k in state_dict
            if k.startswith("features.") and k.endswith(".weight")
        }
    )
    params: Dict[str, Any] = {}
    for i, tk in enumerate(conv_keys):
        params[f"conv_{i}"] = {
            "kernel": np.asarray(state_dict[f"features.{tk}.weight"]).transpose(2, 3, 1, 0),
            "bias": np.asarray(state_dict[f"features.{tk}.bias"]),
        }
    for name, tk in (("fc1", 0), ("fc2", 3)):
        if f"classifier.{tk}.weight" in state_dict:
            params[name] = {
                "kernel": np.asarray(state_dict[f"classifier.{tk}.weight"]).T,
                "bias": np.asarray(state_dict[f"classifier.{tk}.bias"]),
            }
    return params


def load_vgg16(
    weights_path: Optional[str] = None,
    preprocess: str = "caffe",
    tiny: bool = False,
):
    """(model, variables). `tiny` builds a narrow tower for smoke tests;
    random init keeps pipelines runnable without weights (P&R numbers are
    then internally consistent but not reference-comparable)."""
    if tiny:
        model = VGG16Features(
            stages=((4,), (8,)), fc_dim=16, input_size=16, preprocess=preprocess
        )
        probe = 16
    else:
        model = VGG16Features(preprocess=preprocess)
        probe = 224
    if weights_path is not None:
        import torch

        sd = torch.load(weights_path, map_location="cpu", weights_only=False)
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        params = convert_vgg16_state_dict(
            {k: np.asarray(v) for k, v in sd.items()}
        )
        variables = {"params": jax.tree_util.tree_map(jnp.asarray, params)}
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, probe, probe, 3))
        )
    return model, variables


def make_vgg_feature_fn(model: VGG16Features, variables, batch_size: int = 64):
    """Batched jitted fc2-feature extractor over an (N,H,W,C) [0,1] array."""

    @jax.jit
    def _one(batch):
        return model.apply(variables, batch)

    def extract(images: np.ndarray) -> np.ndarray:
        feats = []
        for i in range(0, len(images), batch_size):
            feats.append(np.asarray(_one(jnp.asarray(images[i : i + batch_size]))))
        return np.concatenate(feats)

    return extract
