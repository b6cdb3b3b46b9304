"""Flax ResNet-18 feature tower (torchvision layout).

The reference's CIFAR100_regroup clusters PER-IMAGE embeddings from a
pretrained torchvision ResNet-18 with the classification head removed
(reference src/datasets.py:198-235: resize 224, ImageNet normalize,
``models.resnet18(pretrained=True)`` minus the fc layer, k-means into 40
pseudo-groups). This module re-creates that tower natively so the whole
embed step is one jittable XLA program; weights convert from a torchvision
``resnet18`` state dict via `convert_resnet18_state_dict` (numeric parity
with a torch oracle pinned in tests/test_resnet_numeric.py).

Architecture (He et al. 2015, the torchvision v1 graph): 7x7/2 stem conv,
BN-ReLU, 3x3/2 max pool, four stages of two BasicBlocks each at widths
(64, 128, 256, 512) — stages 2-4 downsample with a strided conv + 1x1
projection shortcut — then global average pooling to the 512-d feature the
regroup pathway consumes.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

RESNET18_STAGES: Tuple[int, ...] = (64, 128, 256, 512)
RESNET18_BLOCKS: Tuple[int, ...] = (2, 2, 2, 2)

_TV_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_TV_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _bn(name: str):
    # torchvision BatchNorm2d defaults: eps 1e-5; inference uses running stats.
    return nn.BatchNorm(
        use_running_average=True, epsilon=1e-5, momentum=0.9, name=name
    )


class BasicBlock(nn.Module):
    """conv3x3-BN-ReLU-conv3x3-BN with identity/projection shortcut."""

    channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        h = nn.Conv(
            self.channels, (3, 3), strides=(self.stride, self.stride),
            padding=1, use_bias=False, name="conv1",
        )(x)
        h = _bn("bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(
            self.channels, (3, 3), padding=1, use_bias=False, name="conv2"
        )(h)
        h = _bn("bn2")(h)
        if self.stride != 1 or x.shape[-1] != self.channels:
            identity = nn.Conv(
                self.channels, (1, 1), strides=(self.stride, self.stride),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = _bn("downsample_bn")(identity)
        return nn.relu(h + identity)


class ResNet18Features(nn.Module):
    """Input NHWC RGB in [0, 1]; returns the pooled 512-d feature vector.

    ``preprocess="torchvision"`` applies the ImageNet mean/std normalization
    the reference's transform uses (src/datasets.py:200-206); "none" expects
    already-normalized input (the oracle-parity tests use this).
    """

    stages: Tuple[int, ...] = RESNET18_STAGES
    blocks: Tuple[int, ...] = RESNET18_BLOCKS
    preprocess: str = "torchvision"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.preprocess == "torchvision":
            x = (x - _TV_MEAN) / _TV_STD
        elif self.preprocess != "none":
            raise ValueError(f"unknown preprocess {self.preprocess!r}")

        h = nn.Conv(
            self.stages[0], (7, 7), strides=(2, 2), padding=3, use_bias=False,
            name="conv1",
        )(x)
        h = _bn("bn1")(h)
        h = nn.relu(h)
        # torchvision MaxPool2d(3, stride=2, padding=1)
        h = jnp.pad(
            h, ((0, 0), (1, 1), (1, 1), (0, 0)),
            constant_values=-jnp.inf,
        )
        h = nn.max_pool(h, (3, 3), strides=(2, 2), padding="VALID")

        for i, (ch, n_blocks) in enumerate(zip(self.stages, self.blocks)):
            for b in range(n_blocks):
                stride = 2 if (i > 0 and b == 0) else 1
                h = BasicBlock(ch, stride, name=f"layer{i + 1}_{b}")(h)

        return jnp.mean(h, axis=(1, 2))


def convert_resnet18_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """torchvision ``resnet18().state_dict()`` -> flax variables.

    Conv kernels transpose OIHW -> HWIO; BatchNorm running stats land in
    the batch_stats collection. The fc head is ignored (the reference strips
    it too, src/datasets.py:210-212).
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = jnp.asarray(np.asarray(value))

    def _module_path(parts):
        # torchvision name -> flax module path segments
        if parts[0] in ("conv1", "bn1"):
            return [parts[0]]
        layer, block, sub = parts[0], parts[1], parts[2]
        base = f"{layer}_{block}"
        if sub == "downsample":
            which = parts[3]
            return [base, "downsample_conv" if which == "0" else "downsample_bn"]
        return [base, sub]

    for key, v in state_dict.items():
        v = np.asarray(getattr(v, "numpy", lambda: v)())
        parts = key.split(".")
        if parts[0] == "fc":
            continue
        leaf = parts[-1]
        mod = _module_path(parts[:-1])
        if leaf == "weight" and v.ndim == 4:  # conv OIHW -> HWIO
            _set(params, mod + ["kernel"], v.transpose(2, 3, 1, 0))
        elif leaf == "weight":  # BN scale
            _set(params, mod + ["scale"], v)
        elif leaf == "bias":
            _set(params, mod + ["bias"], v)
        elif leaf == "running_mean":
            _set(batch_stats, mod + ["mean"], v)
        elif leaf == "running_var":
            _set(batch_stats, mod + ["var"], v)
        # num_batches_tracked is dropped

    return {"params": params, "batch_stats": batch_stats}


def unflatten_npz(flat) -> Dict:
    """'/'-joined flat mapping (cli.convert_weights .npz layout) -> nested."""
    nested: Dict[str, Any] = {}
    for key in flat.keys() if hasattr(flat, "keys") else flat:
        node = nested
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(flat[key])
    return nested


def resnet18_embed(
    variables: Dict,
    images01: np.ndarray,
    batch_size: int = 256,
    input_size: int = 224,
    stages: Tuple[int, ...] = RESNET18_STAGES,
    blocks: Tuple[int, ...] = RESNET18_BLOCKS,
) -> np.ndarray:
    """Per-image 512-d embeddings of NHWC [0,1] images, batched on device.

    Mirrors the reference's regroup transform (src/datasets.py:200-206):
    bilinear resize to ``input_size`` then ImageNet normalization. (PIL's
    antialiased bilinear differs slightly from jax.image.resize at strong
    downscales; regrouping is a 32->224 UPSCALE, where both agree closely.)
    """
    model = ResNet18Features(stages=stages, blocks=blocks)

    @jax.jit
    def run(x):
        x = jax.image.resize(
            x, (x.shape[0], input_size, input_size, x.shape[-1]), "bilinear"
        )
        return model.apply(variables, x)

    feats = []
    n = len(images01)
    for start in range(0, n, batch_size):
        feats.append(np.asarray(run(jnp.asarray(images01[start:start + batch_size]))))
    return np.concatenate(feats, axis=0)
