"""Attribution estimators vs analytic oracles (SURVEY.md §4)."""

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.attributions import (
    collect_data,
    evaluate_lds,
)
from group_attribution_for_diffusion_models_tpu.attributions.methods import (
    brute_force_shapley,
    data_banzhaf,
    data_shapley,
    datamodel,
    kernel_shap,
    ridge_cv,
)
from group_attribution_for_diffusion_models_tpu.data import removal_masks
from group_attribution_for_diffusion_models_tpu.utils import append_record


def _linear_game(w, c=0.0):
    return lambda s: float(sum(w[i] for i in s) + c)


def test_brute_force_shapley_linear_game():
    """For additive games, Shapley values equal the weights exactly."""
    w = np.array([3.0, -1.0, 0.5, 2.0])
    vals = brute_force_shapley(4, _linear_game(w, c=7.0))
    np.testing.assert_allclose(vals, w, atol=1e-10)


def test_data_shapley_recovers_brute_force():
    """Closed-form KernelSHAP on Shapley-kernel subsets ≈ exact Shapley."""
    rng = np.random.RandomState(0)
    d = 8
    w = rng.normal(size=d)
    # Non-additive interaction term makes this a real test.
    def value(s):
        base = sum(w[i] for i in s)
        bonus = 0.5 if (0 in s and 1 in s) else 0.0
        return base + bonus

    exact = brute_force_shapley(d, value)

    masks = removal_masks("shapley", d, seeds=range(2000))
    y = np.array([value(set(np.flatnonzero(m))) for m in masks])
    v1, v0 = value(set(range(d))), value(set())
    est = data_shapley(d, masks, y, v1, v0).ravel()

    np.testing.assert_allclose(est, exact, atol=0.15)
    # Efficiency: attributions sum to v1 - v0.
    np.testing.assert_allclose(est.sum(), v1 - v0, atol=1e-6)


def test_kernel_shap_anchor_variant_agrees():
    rng = np.random.RandomState(1)
    d = 6
    w = rng.normal(size=d)
    value = _linear_game(w)
    masks = removal_masks("shapley", d, seeds=range(500))
    y = masks @ w
    est = kernel_shap(d, masks, y, float(w.sum()), 0.0)
    np.testing.assert_allclose(est, w, atol=1e-3)


def test_data_banzhaf_linear_game():
    rng = np.random.RandomState(2)
    d = 10
    w = rng.normal(size=d)
    masks = (rng.rand(400, d) > 0.5).astype(np.float64)
    # The {-1/2,+1/2} regression has no intercept, so it exactly recovers a
    # game expressed in shifted coordinates...
    y_shifted = (masks - 0.5) @ w
    est = data_banzhaf(masks, y_shifted)
    np.testing.assert_allclose(est, w, atol=1e-8)
    # ...while the constant leakage from unshifted masks (0.5*sum(w)) decays
    # with sample count.
    big = (np.random.RandomState(7).rand(20000, d) > 0.5).astype(np.float64)
    est_big = data_banzhaf(big, big @ w)
    np.testing.assert_allclose(est_big, w, atol=0.15)


def test_ridge_cv_and_datamodel():
    rng = np.random.RandomState(3)
    d, n = 12, 300
    w = rng.normal(size=d)
    x = (rng.rand(n, d) > 0.5).astype(np.float64)
    y = x @ w + 0.01 * rng.normal(size=n)
    coef = ridge_cv(x, y)
    np.testing.assert_allclose(coef, w, atol=0.05)

    boots = datamodel(x, y, num_runs=3, seed=0)
    assert boots.shape == (3, d)
    np.testing.assert_allclose(boots.mean(axis=0), w, atol=0.1)
    # Determinism by seed.
    boots2 = datamodel(x, y, num_runs=3, seed=0)
    np.testing.assert_array_equal(boots, boots2)


def test_evaluate_lds_perfect_and_inverted():
    rng = np.random.RandomState(4)
    d = 5
    attrs = rng.normal(size=d)
    x_test = (rng.rand(50, d) > 0.5).astype(np.float64)
    y_test = x_test @ attrs
    mean, ci = evaluate_lds(attrs, [(x_test, y_test), (x_test, y_test)])
    assert mean == pytest.approx(100.0)
    assert ci == pytest.approx(0.0)
    mean_inv, _ = evaluate_lds(-attrs, [(x_test, y_test)])
    assert mean_inv == pytest.approx(-100.0)


def test_collect_data_from_db(tmp_path):
    """Masks rebuild from remaining_idx, or re-derive from removal_seed."""
    from group_attribution_for_diffusion_models_tpu.data import sample_removal

    db = str(tmp_path / "db.jsonl")
    n = 20
    for seed in range(4):
        remaining, _ = sample_removal("shapley", n, seed=seed)
        rec = {
            "exp_name": "t",
            "removal_dist": "shapley",
            "removal_seed": seed,
            "fid_value": float(seed),
        }
        if seed % 2 == 0:  # half the rows carry explicit indices
            rec["remaining_idx"] = remaining
        append_record(db, rec)

    masks, behaviors, seeds = collect_data(
        db, {"exp_name": "t"}, num_units=n, behavior_key="fid_value"
    )
    assert masks.shape == (4, n)
    np.testing.assert_array_equal(behaviors, [0.0, 1.0, 2.0, 3.0])
    for row, seed in enumerate(seeds):
        expected, _ = sample_removal("shapley", n, seed=seed)
        np.testing.assert_array_equal(np.flatnonzero(masks[row]), np.sort(expected))


def test_ridge_fit_matches_sklearn():
    """The dependency-free ridge matches sklearn's Ridge (the reference's
    RidgeCV building block) coefficient-for-coefficient."""
    from sklearn.linear_model import Ridge

    from group_attribution_for_diffusion_models_tpu.attributions.methods.datamodel import (
        _ridge_fit,
    )

    rng = np.random.RandomState(0)
    x = rng.binomial(1, 0.5, size=(60, 12)).astype(np.float64)
    y = x @ rng.normal(size=12) + 0.3 + rng.normal(scale=0.05, size=60)
    for alpha in (0.1, 1.0, 10.0):
        want = Ridge(alpha=alpha).fit(x, y).coef_
        got = _ridge_fit(x, y, alpha)
        np.testing.assert_allclose(got, want, atol=1e-8)


def test_ridge_cv_matches_sklearn_ridgecv():
    """Full CV pipeline vs sklearn RidgeCV(cv=5) — the reference's estimator
    (reference datamodel.py:28-31): same winning alpha, identical refit."""
    from sklearn.linear_model import RidgeCV

    from group_attribution_for_diffusion_models_tpu.attributions.methods.datamodel import (
        ridge_cv,
    )

    rng = np.random.RandomState(0)
    x = rng.binomial(1, 0.5, (80, 10)).astype(float)
    y = x @ rng.normal(size=10) + rng.normal(scale=0.1, size=80)
    ours = ridge_cv(x, y, alphas=(0.1, 1.0, 10.0), cv=5)
    ref = RidgeCV(cv=5, alphas=[0.1, 1.0, 10.0]).fit(x, y)
    np.testing.assert_allclose(ours, ref.coef_, atol=1e-10)


def test_fit_attribution_accepts_paired_dists():
    from group_attribution_for_diffusion_models_tpu.cli.lds import fit_attribution

    rng = np.random.RandomState(0)
    masks = (rng.rand(12, 6) > 0.5).astype(np.float32)
    y = masks @ np.arange(1.0, 7.0) + 0.1 * rng.randn(12)
    for base, paired in [("shapley", "shapley_paired"),
                         ("uniform", "uniform_paired")]:
        a = fit_attribution(base, masks, y, 6, v1=y.max(), v0=y.min())
        b = fit_attribution(paired, masks, y, 6, v1=y.max(), v0=y.min())
        np.testing.assert_allclose(a, b)
