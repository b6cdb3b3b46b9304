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


def test_shapley_paired_partitions():
    """Seeds (2k, 2k+1) are exact complements; each half is never empty."""
    for base in range(0, 20, 2):
        r0, x0 = sample_removal("shapley_paired", 16, seed=base)
        r1, x1 = sample_removal("shapley_paired", 16, seed=base + 1)
        np.testing.assert_array_equal(np.sort(r0), np.sort(x1))
        np.testing.assert_array_equal(np.sort(x0), np.sort(r1))
        assert 0 < len(r0) < 16 and 0 < len(r1) < 16
    # by_class variant partitions the class set the same way.
    labels = np.arange(6).repeat(4)
    r0, _ = sample_removal("shapley_paired", labels, seed=4, by_class=True)
    r1, _ = sample_removal("shapley_paired", labels, seed=5, by_class=True)
    kept0 = set(np.unique(labels[r0]))
    kept1 = set(np.unique(labels[r1]))
    assert kept0 | kept1 == set(range(6)) and not (kept0 & kept1)


def test_shapley_paired_variance_reduction():
    """Paired sampling beats iid sampling against an exact nonlinear game
    at the same subset budget (Covert & Lee 2021 paired-sampling claim)."""
    from group_attribution_for_diffusion_models_tpu.attributions.methods import (
        brute_force_shapley,
        data_shapley,
    )

    n = 10
    rng = np.random.RandomState(7)
    w = rng.normal(size=n)
    u = rng.normal(size=(n, n)) * 0.4
    u = np.triu(u, 1)

    def game(s):
        idx = np.array(sorted(s), np.int64)
        if not len(idx):
            return 0.0
        m = np.zeros(n)
        m[idx] = 1.0
        return float(w @ m + m @ u @ m)

    exact = brute_force_shapley(n, game)
    v1, v0 = game(set(range(n))), game(set())

    def mse(dist, seed0, count=24):
        xs, ys = [], []
        for j in range(count):
            remaining, _ = sample_removal(dist, n, seed=seed0 + j)
            m = np.zeros(n, np.float32)
            m[remaining] = 1.0
            xs.append(m)
            ys.append(game(set(remaining.tolist())))
        est = data_shapley(n, np.stack(xs), np.asarray(ys), v1, v0).ravel()
        return float(np.mean((est - exact) ** 2))

    seeds = [1000 * (e + 1) * 2 for e in range(8)]
    mse_iid = np.mean([mse("shapley", s) for s in seeds])
    mse_paired = np.mean([mse("shapley_paired", s) for s in seeds])
    assert mse_paired < mse_iid, (mse_paired, mse_iid)


def test_uniform_paired_partitions():
    for base in range(0, 12, 2):
        r0, x0 = sample_removal("uniform_paired", 32, seed=base)
        r1, x1 = sample_removal("uniform_paired", 32, seed=base + 1)
        np.testing.assert_array_equal(np.sort(r0), np.sort(x1))
        np.testing.assert_array_equal(np.sort(x0), np.sort(r1))
    # Even seeds reproduce the plain uniform draw (marginal unchanged).
    ru, _ = sample_removal("uniform", 32, seed=3)
    rp, _ = sample_removal("uniform_paired", 32, seed=6)
    np.testing.assert_array_equal(ru, rp)
