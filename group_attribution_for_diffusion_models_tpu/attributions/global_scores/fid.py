"""FID: feature statistics and Fréchet distance.

Same math as reference src/attributions/global_scores/fid_score.py:23-107
(via pytorch_fid), re-organized TPU-first: feature extraction (a Flax
InceptionV3 forward over image batches — global_scores.inception_v3) is
separated from the pure statistics here, so the extractor compiles to one XLA
graph and the statistics are testable without pretrained weights.

Reference stats are cached to disk exactly like the reference's ``stats.pkl``
(reference fid_score.py:42-45).
"""

from __future__ import annotations

import os
import pickle
from typing import Optional, Tuple

import numpy as np
from scipy import linalg


def compute_feature_stats(features: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """(mu, sigma) of an (N, D) feature matrix."""
    features = np.asarray(features, dtype=np.float64)
    mu = features.mean(axis=0)
    sigma = np.cov(features, rowvar=False)
    return mu, sigma


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance between two Gaussians (pytorch_fid semantics).

    ||mu1 - mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)), with the eps-jitter retry
    for numerically singular products.
    """
    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    diff = mu1 - mu2

    covmean = linalg.sqrtm(sigma1 @ sigma2)
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset) @ (sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(
                f"Imaginary component {np.max(np.abs(covmean.imag))} in sqrtm"
            )
        covmean = covmean.real

    return float(
        diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def calculate_fid_from_features(
    gen_features: np.ndarray,
    ref_features: Optional[np.ndarray] = None,
    ref_stats: Optional[Tuple[np.ndarray, np.ndarray]] = None,
) -> float:
    """FID between generated features and reference features or cached stats."""
    mu_g, sigma_g = compute_feature_stats(gen_features)
    if ref_stats is not None:
        mu_r, sigma_r = ref_stats
    elif ref_features is not None:
        mu_r, sigma_r = compute_feature_stats(ref_features)
    else:
        raise ValueError("need ref_features or ref_stats")
    return frechet_distance(mu_g, sigma_g, mu_r, sigma_r)


def save_stats(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    """Cache reference (mu, sigma) like the reference's stats.pkl."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        pickle.dump({"mu": mu, "sigma": sigma}, f)


def load_stats(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return d["mu"], d["sigma"]
