"""Local model-behavior image metrics: MSE, NRMSE, SSIM.

The reference computes per-image MSE/NRMSE/SSIM between paired generations
from the full vs subset model (reference unconditional_generation/
calculate_local_scores.py:303-374 via skimage). Implemented here as jitted
jnp functions (batched, fused) with skimage-compatible semantics: SSIM uses
the uniform 7x7 window and data_range-scaled stability constants of
structural_similarity's defaults.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def mse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Per-image mean squared error over (B, H, W, C)."""
    return jnp.mean((a - b) ** 2, axis=(1, 2, 3))


def nrmse(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Normalized RMSE (Euclidean normalization, skimage default):
    ||a-b|| / ||a||, per image."""
    num = jnp.sqrt(jnp.sum((a - b) ** 2, axis=(1, 2, 3)))
    den = jnp.sqrt(jnp.sum(a**2, axis=(1, 2, 3)))
    return num / jnp.maximum(den, 1e-12)


def _uniform_filter(x: jnp.ndarray, size: int = 7) -> jnp.ndarray:
    """Mean filter with VALID padding over (B, H, W, C)."""
    kernel = jnp.ones((size, size, 1, 1), x.dtype) / (size * size)
    c = x.shape[-1]
    kernel = jnp.tile(kernel, (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, kernel, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


def ssim(
    a: jnp.ndarray, b: jnp.ndarray, data_range: float = 1.0, win_size: int = 7
) -> jnp.ndarray:
    """Mean SSIM per image, channels averaged (skimage uniform-window flavor)."""
    k1, k2 = 0.01, 0.03
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    # skimage uses unbiased covariances: ddof-corrected via n/(n-1).
    n = win_size * win_size
    cov_norm = n / (n - 1)

    mu_a = _uniform_filter(a, win_size)
    mu_b = _uniform_filter(b, win_size)
    mu_aa = _uniform_filter(a * a, win_size)
    mu_bb = _uniform_filter(b * b, win_size)
    mu_ab = _uniform_filter(a * b, win_size)

    var_a = cov_norm * (mu_aa - mu_a * mu_a)
    var_b = cov_norm * (mu_bb - mu_b * mu_b)
    cov = cov_norm * (mu_ab - mu_a * mu_b)

    num = (2 * mu_a * mu_b + c1) * (2 * cov + c2)
    den = (mu_a**2 + mu_b**2 + c1) * (var_a + var_b + c2)
    return jnp.mean(num / den, axis=(1, 2, 3))
