"""Retraining-free similarity baselines: pixel distance, embedding similarity,
class/group aggregation.

Mirrors reference src/attributions/methods/attribution_utils.py
(aggregate_by_class :15-48, CLIPScore :80-163, pixel_distance :166-217) and
the text_to_image per-baseline scripts (pixel_similarity.py,
clip_similarity.py, aesthetic_score.py). Embeddings are pluggable (CLIP
towers need local weights in this zero-egress image); the similarity math is
batched jnp — one normalized matmul on the MXU per (gen, train) block.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def cosine_similarity_matrix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(n, m) cosine similarities between row sets, on device."""
    a_j = jnp.asarray(a, jnp.float32)
    b_j = jnp.asarray(b, jnp.float32)
    a_j = a_j / jnp.maximum(jnp.linalg.norm(a_j, axis=1, keepdims=True), 1e-12)
    b_j = b_j / jnp.maximum(jnp.linalg.norm(b_j, axis=1, keepdims=True), 1e-12)
    return np.asarray(a_j @ b_j.T)


def pixel_distance_scores(
    gen_images: np.ndarray, train_images: np.ndarray
) -> np.ndarray:
    """Raw-pixel cosine similarity (n_gen, n_train)
    (reference attribution_utils.pixel_distance :166-217)."""
    g = gen_images.reshape(len(gen_images), -1)
    t = train_images.reshape(len(train_images), -1)
    return cosine_similarity_matrix(g, t)


def embedding_similarity_scores(
    gen_embeddings: np.ndarray, train_embeddings: np.ndarray
) -> np.ndarray:
    """Embedding-space cosine similarity (the CLIPScore pattern :80-163)."""
    return cosine_similarity_matrix(gen_embeddings, train_embeddings)


def aggregate_by_class(
    scores: np.ndarray,
    labels: Sequence[int],
    agg: str = "mean",
    by: str = "max",
) -> np.ndarray:
    """(n_gen, n_train) scores -> per-group attributions.

    `by` collapses over generated images per train example (max/avg like the
    reference's grouped max/avg, text_to_image/pixel_similarity.py:213-245),
    then `agg` collapses train examples within each group.
    """
    labels = np.asarray(labels)
    per_train = scores.max(axis=0) if by == "max" else scores.mean(axis=0)
    groups = np.unique(labels)
    out = np.zeros(len(groups))
    for i, g in enumerate(groups):
        vals = per_train[labels == g]
        out[i] = vals.mean() if agg == "mean" else (
            vals.max() if agg == "max" else vals.sum()
        )
    return out


def sparsification_baseline(
    attrs: np.ndarray, labels: Sequence[int]
) -> Dict[int, float]:
    """Per-group attribution sums from per-example scores."""
    labels = np.asarray(labels)
    return {int(g): float(attrs[labels == g].sum()) for g in np.unique(labels)}
