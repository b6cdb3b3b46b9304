"""Flax InceptionV3 feature tower (pytorch_fid-compatible).

TPU-native replacement for the pytorch_fid InceptionV3 the reference scores
FID/IS with (reference src/attributions/global_scores/fid_score.py:28,
inception_score.py:15-76; SURVEY.md §2.6). The whole scoring path — bilinear
resize to 299, input scaling, conv tower, pool3 features, logits — is one
jittable function, so feature extraction over 50k images is a single batched
XLA program.

Two fidelity-critical details of the FID variant are reproduced:

* average pooling inside Inception blocks uses count_include_pad=False;
* the final Inception block (Mixed_7c) of the FID network uses max pooling in
  its pool branch (FIDInceptionE_2).

Weights convert from a locally available pytorch_fid/torchvision state dict
via `convert_torch_state_dict` (this image has no network egress, so
downloads are the user's responsibility; with no weights the tower
initializes randomly, which keeps pipelines runnable and the scoring *math*
exact, but FID values are then not comparable to the reference's).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def _avg_pool_no_pad(x: jnp.ndarray, window: int = 3) -> jnp.ndarray:
    """3x3 stride-1 SAME avg pool with count_include_pad=False semantics."""
    ones = jnp.ones(x.shape[:1] + x.shape[1:3] + (1,), x.dtype)
    sum_ = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    cnt = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, window, window, 1), (1, 1, 1, 1), "SAME"
    )
    return sum_ / cnt


def _max_pool(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, window, window, 1), (1, stride, stride, 1),
        "VALID",
    )


class BasicConv2d(nn.Module):
    """Conv + frozen BatchNorm(eps=1e-3) + ReLU (inference-only tower)."""

    features: int
    kernel: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Any = "VALID"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.features, self.kernel, strides=self.strides, padding=self.padding,
            use_bias=False, name="conv",
        )(x)
        x = nn.BatchNorm(
            use_running_average=True, epsilon=1e-3, momentum=0.9, name="bn"
        )(x)
        return nn.relu(x)


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=2, name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        bp = _max_pool(x)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7dbl_5")(bd)
        bp = _avg_pool_no_pad(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)), name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)), name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        bp = _max_pool(x)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_mode: str = "avg"  # FIDInceptionE_2 (Mixed_7c) uses "max"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)

        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3a = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3_2a")(b3)
        b3b = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)

        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=1, name="branch3x3dbl_2")(bd)
        bda = BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)), name="branch3x3dbl_3a")(bd)
        bdb = BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)), name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)

        if self.pool_mode == "avg":
            bp = _avg_pool_no_pad(x)
        else:
            bp = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 1, 1, 1), "SAME"
            )
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3(nn.Module):
    """Pool3-feature + logits tower. Input NHWC in [0, 1], any spatial size.

    num_classes=1008 matches the FID weights (TF-slim head); 1000 matches
    torchvision (the reference's IS path).
    """

    num_classes: int = 1008
    fid_variant: bool = True
    resize_input: bool = True
    normalize_input: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Dict[str, jnp.ndarray]:
        if self.resize_input:
            b = x.shape[0]
            x = jax.image.resize(x, (b, 299, 299, x.shape[-1]), "bilinear")
        if self.normalize_input:
            x = 2.0 * x - 1.0

        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=1, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool(x)

        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max" if self.fid_variant else "avg", name="Mixed_7c")(x)

        pool3 = jnp.mean(x, axis=(1, 2))  # adaptive avg pool to (B, 2048)
        logits = nn.Dense(self.num_classes, name="fc")(pool3)
        return {"pool3": pool3, "logits": logits}


# --- Torch weight conversion -------------------------------------------------


def convert_torch_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """Convert a pytorch_fid / torchvision InceptionV3 state dict to flax params.

    Torch conv weights (O, I, kH, kW) transpose to flax (kH, kW, I, O);
    BatchNorm running stats land in batch_stats.
    """
    params: Dict[str, Any] = {}
    batch_stats: Dict[str, Any] = {}

    def _set(tree, path, value):
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, value in state_dict.items():
        v = np.asarray(value)
        parts = key.split(".")
        if parts[-2] == "conv" and parts[-1] == "weight":
            _set(params, parts[:-1] + ["kernel"], v.transpose(2, 3, 1, 0))
        elif parts[-2] == "bn":
            if parts[-1] == "weight":
                _set(params, parts[:-1] + ["scale"], v)
            elif parts[-1] == "bias":
                _set(params, parts[:-1] + ["bias"], v)
            elif parts[-1] == "running_mean":
                _set(batch_stats, parts[:-1] + ["mean"], v)
            elif parts[-1] == "running_var":
                _set(batch_stats, parts[:-1] + ["var"], v)
        elif parts[0] == "fc":
            if parts[-1] == "weight":
                _set(params, ["fc", "kernel"], v.T)
            else:
                _set(params, ["fc", "bias"], v)
        # num_batches_tracked and aux classifier weights are dropped.
    return {"params": params, "batch_stats": batch_stats}


def load_inception(
    weights_path: Optional[str] = None, num_classes: int = 1008,
    fid_variant: bool = True,
):
    """(model, variables). Random init when no weights file is available."""
    model = InceptionV3(num_classes=num_classes, fid_variant=fid_variant)
    if weights_path is not None:
        import torch

        sd = torch.load(weights_path, map_location="cpu")
        if hasattr(sd, "state_dict"):
            sd = sd.state_dict()
        variables = convert_torch_state_dict(
            {k: v.numpy() for k, v in sd.items()}
        )
        variables = jax.tree_util.tree_map(jnp.asarray, variables)
    else:
        variables = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3))
        )
        # He-rescale the conv stack (flax's lecun_normal lacks the ReLU
        # factor): through ~90 conv+ReLU layers the default init attenuates
        # activation variance to ~3e-4, making pool3 features effectively
        # CONSTANT — FID between any two sample sets rounds to 0 and carries
        # no signal. With the sqrt(2) gain the random tower is a
        # variance-preserving random-feature extractor (measured: feature
        # std ~0.5; FID 266 between distinct noise distributions vs 0.003
        # for near-identical sets), so zero-egress runs get a deterministic,
        # signal-bearing FID that real converted weights drop in over.
        variables = jax.tree_util.tree_map_with_path(
            lambda p, x: x * np.sqrt(2.0)
            if p[-1].key == "kernel" and x.ndim == 4 else x,
            variables,
        )
    return model, variables


def make_feature_fn(model: InceptionV3, variables, batch_size: int = 256):
    """Batched jitted pool3+logits extractor over an (N,H,W,C) [0,1] array."""

    @jax.jit
    def _one(batch):
        out = model.apply(variables, batch)
        return out["pool3"], out["logits"]

    def extract(images: np.ndarray):
        feats, logits = [], []
        for i in range(0, len(images), batch_size):
            chunk = np.asarray(images[i : i + batch_size])
            n = len(chunk)
            if n < batch_size and i > 0:
                # Pad the ragged tail to the compiled batch shape instead of
                # compiling a second executable per distinct remainder (the
                # relay charges minutes per fresh compile).
                chunk = np.concatenate(
                    [chunk, np.zeros((batch_size - n,) + chunk.shape[1:],
                                     chunk.dtype)]
                )
            f, l = _one(jnp.asarray(chunk))
            feats.append(np.asarray(f)[:n])
            logits.append(np.asarray(l)[:n])
        return np.concatenate(feats), np.concatenate(logits)

    return extract
