"""Improved precision & recall via k-NN feature manifolds.

Kynkäänniemi et al. 2019, as in reference src/attributions/global_scores/
precision_recall.py:54-351 (which uses the StyleGAN2 VGG16 TorchScript
extractor). Here the manifold math runs on-device as blocked jnp matmuls —
pairwise distances are a rank-k update (||a||^2 + ||b||^2 - 2ab^T) that maps
straight onto the MXU, replacing the reference's fp16 torch.cdist loop.

Precision = fraction of generated samples inside the real manifold (distance
to some real point <= that point's kth-NN radius); recall = the converse.
Manifold caching mirrors the reference's ``pr_manifold_<dataset>.pt``.
"""

from __future__ import annotations

import functools
import os
import pickle
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class Manifold(NamedTuple):
    features: np.ndarray  # (N, D)
    radii: np.ndarray  # (N,) kth-NN distances


def _pairwise_sq_dists(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Squared euclidean distances (n, m) via one MXU-friendly matmul."""
    a2 = jnp.sum(a * a, axis=1, keepdims=True)
    b2 = jnp.sum(b * b, axis=1, keepdims=True)
    d = a2 + b2.T - 2.0 * (a @ b.T)
    return jnp.maximum(d, 0.0)


@functools.partial(jax.jit, static_argnums=1)
def _kth_nn_radii(features: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """kth nearest-neighbor distance per row (excluding self)."""
    d = _pairwise_sq_dists(features, features)
    n = d.shape[0]
    d = d.at[jnp.arange(n), jnp.arange(n)].set(jnp.inf)
    # k smallest: top_k on negative distances.
    neg_topk, _ = jax.lax.top_k(-d, k)
    return jnp.sqrt(-neg_topk[:, -1])


def build_manifold(features: np.ndarray, nhood_size: int = 3) -> Manifold:
    feats = jnp.asarray(features, jnp.float32)
    radii = np.asarray(_kth_nn_radii(feats, nhood_size))
    return Manifold(np.asarray(features, np.float32), radii)


@jax.jit
def _covered(queries: jnp.ndarray, refs: jnp.ndarray, radii: jnp.ndarray) -> jnp.ndarray:
    """For each query: does any ref ball (radius_i) contain it?"""
    d = jnp.sqrt(_pairwise_sq_dists(queries, refs))
    return jnp.any(d <= radii[None, :], axis=1)


def compute_precision_recall(
    real_features: np.ndarray,
    gen_features: np.ndarray,
    nhood_size: int = 3,
    real_manifold: Manifold | None = None,
) -> Tuple[float, float]:
    """(precision, recall) between real and generated feature sets."""
    if real_manifold is None:
        real_manifold = build_manifold(real_features, nhood_size)
    gen_manifold = build_manifold(gen_features, nhood_size)

    precision = float(
        np.mean(
            np.asarray(
                _covered(
                    jnp.asarray(gen_features, jnp.float32),
                    jnp.asarray(real_manifold.features),
                    jnp.asarray(real_manifold.radii),
                )
            )
        )
    )
    recall = float(
        np.mean(
            np.asarray(
                _covered(
                    jnp.asarray(real_manifold.features),
                    jnp.asarray(gen_manifold.features),
                    jnp.asarray(gen_manifold.radii),
                )
            )
        )
    )
    return precision, recall


def save_manifold(path: str, manifold: Manifold) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"features": manifold.features, "radii": manifold.radii}, f)


def load_manifold(path: str) -> Manifold:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return Manifold(d["features"], d["radii"])
