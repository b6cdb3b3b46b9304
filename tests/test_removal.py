"""Removal-sampler determinism and distribution tests (SURVEY.md §4).

The key contract: samplers are bit-identical to the reference's
np.random.RandomState call sequences (reference src/datasets.py:516-743), so
a removal_seed identifies the same subset everywhere.
"""

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.data import (
    remove_data_by_class,
    remove_data_by_datamodel,
    remove_data_by_loo,
    remove_data_by_shapley,
    remove_data_by_uniform,
    remove_data_for_aoi,
    removal_masks,
    sample_removal,
)


def _check_partition(remaining, removed, n):
    combined = np.sort(np.concatenate([remaining, removed]))
    np.testing.assert_array_equal(combined, np.arange(n))


def test_uniform_matches_reference_rng():
    """Bit-compat with reference src/datasets.py:559-579."""
    n, seed = 100, 7
    remaining, removed = remove_data_by_uniform(n, seed=seed)
    rng = np.random.RandomState(seed)
    selected = rng.normal(size=n) > 0
    np.testing.assert_array_equal(remaining, np.arange(n)[selected])
    _check_partition(remaining, removed, n)


def test_datamodel_matches_reference_rng():
    """Bit-compat with reference src/datasets.py:582-628."""
    n, alpha, seed = 200, 0.3, 11
    remaining, removed = remove_data_by_datamodel(n, alpha=alpha, seed=seed)
    rng = np.random.RandomState(seed)
    all_idx = np.arange(n)
    rng.shuffle(all_idx)
    np.testing.assert_array_equal(remaining, all_idx[: int(alpha * n)])
    assert len(remaining) == int(alpha * n)
    _check_partition(remaining, removed, n)


def test_shapley_matches_reference_rng():
    """Bit-compat with reference src/datasets.py:631-697."""
    n, seed = 50, 3
    remaining, removed = remove_data_by_shapley(n, seed=seed)
    rng = np.random.RandomState(seed)
    sizes = np.arange(1, n)
    probs = (n - 1) / (sizes * (n - sizes))
    probs = probs / probs.sum()
    size = rng.choice(sizes, size=1, p=probs)[0]
    all_idx = np.arange(n)
    rng.shuffle(all_idx)
    np.testing.assert_array_equal(remaining, all_idx[:size])
    _check_partition(remaining, removed, n)


def test_shapley_size_distribution():
    """Empirical |S| histogram tracks the Shapley-kernel size PMF."""
    n = 10
    sizes = np.array(
        [len(remove_data_by_shapley(n, seed=s)[0]) for s in range(4000)]
    )
    counts = np.bincount(sizes, minlength=n)[1:n]
    expected = (n - 1) / (np.arange(1, n) * (n - np.arange(1, n)))
    expected = expected / expected.sum() * len(sizes)
    # Loose chi-square-ish check: every size within 20% rel of expectation.
    np.testing.assert_allclose(counts, expected, rtol=0.2)


def test_shapley_by_class():
    labels = np.repeat(np.arange(5), 20)
    remaining, removed = remove_data_by_shapley(labels, seed=1, by_class=True)
    _check_partition(remaining, removed, 100)
    # Removal must be class-aligned.
    removed_classes = set(labels[removed].tolist())
    remaining_classes = set(labels[remaining].tolist())
    assert removed_classes.isdisjoint(remaining_classes)


def test_uniform_by_class_partitions():
    labels = np.repeat(np.arange(10), 10)
    remaining, removed = remove_data_by_uniform(labels, seed=5, by_class=True)
    _check_partition(remaining, removed, 100)
    assert set(labels[remaining]).isdisjoint(set(labels[removed]))


def test_by_class_exclusion():
    labels = np.array([3, 5, 3, 9, 5, 3])
    remaining, removed = remove_data_by_class(labels, excluded_class=[5])
    np.testing.assert_array_equal(removed, [1, 4])
    _check_partition(remaining, removed, 6)


def test_loo_aoi():
    remaining, removed = remove_data_by_loo(5, 2)
    np.testing.assert_array_equal(removed, [2])
    np.testing.assert_array_equal(remaining, [0, 1, 3, 4])
    remaining, removed = remove_data_for_aoi(5, 2)
    np.testing.assert_array_equal(remaining, [2])
    np.testing.assert_array_equal(removed, [0, 1, 3, 4])


def test_sample_removal_dispatch_deterministic():
    for dist in ["uniform", "datamodel", "shapley"]:
        a = sample_removal(dist, 64, seed=9)
        b = sample_removal(dist, 64, seed=9)
        np.testing.assert_array_equal(a[0], b[0])
        c = sample_removal(dist, 64, seed=10)
        assert len(a[0]) != len(c[0]) or not np.array_equal(a[0], c[0])


def test_removal_masks_shape_and_consistency():
    masks = removal_masks("shapley", 32, seeds=range(8))
    assert masks.shape == (8, 32)
    assert set(np.unique(masks)) <= {0.0, 1.0}
    remaining, _ = remove_data_by_shapley(32, seed=3)
    np.testing.assert_array_equal(np.flatnonzero(masks[3]), np.sort(remaining))
