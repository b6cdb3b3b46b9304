"""Global-score math vs closed-form/golden values (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.attributions.global_scores import (
    InceptionV3,
    build_manifold,
    calculate_diversity_score,
    calculate_fid_from_features,
    compute_feature_stats,
    compute_precision_recall,
    diversity_entropy,
    frechet_distance,
    inception_score_from_logits,
    load_stats,
    save_stats,
)


def test_frechet_identical_is_zero():
    rng = np.random.RandomState(0)
    f = rng.normal(size=(500, 16))
    mu, sigma = compute_feature_stats(f)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-6)


def test_frechet_mean_shift_closed_form():
    """For equal covariances, FID = ||mu1 - mu2||^2 exactly."""
    rng = np.random.RandomState(1)
    sigma = np.eye(8)
    mu1, mu2 = np.zeros(8), np.full(8, 0.5)
    d = frechet_distance(mu1, sigma, mu2, sigma)
    assert d == pytest.approx(8 * 0.25, abs=1e-8)


def test_frechet_1d_closed_form():
    # 1-D gaussians: (m1-m2)^2 + (s1 - s2)^2 with s = sqrt(var).
    d = frechet_distance(np.array([1.0]), np.array([[4.0]]), np.array([3.0]), np.array([[1.0]]))
    assert d == pytest.approx((1 - 3) ** 2 + (2 - 1) ** 2, abs=1e-8)


def test_fid_from_features_sanity():
    rng = np.random.RandomState(2)
    real = rng.normal(size=(400, 32))
    close = real + 0.01 * rng.normal(size=real.shape)
    far = rng.normal(loc=3.0, size=(400, 32))
    fid_close = calculate_fid_from_features(close, ref_features=real)
    fid_far = calculate_fid_from_features(far, ref_features=real)
    assert fid_close < fid_far
    assert fid_close < 1.0


def test_stats_cache_roundtrip(tmp_path):
    rng = np.random.RandomState(3)
    f = rng.normal(size=(100, 8))
    mu, sigma = compute_feature_stats(f)
    p = str(tmp_path / "stats.pkl")
    save_stats(p, mu, sigma)
    mu2, sigma2 = load_stats(p)
    np.testing.assert_array_equal(mu, mu2)
    np.testing.assert_array_equal(sigma, sigma2)


def test_inception_score_uniform_vs_confident():
    n, c = 200, 10
    # Uniform predictions -> IS = 1.
    logits_uniform = np.zeros((n, c))
    is_u, _ = inception_score_from_logits(logits_uniform, splits=4)
    assert is_u == pytest.approx(1.0, abs=1e-6)
    # Confident, diverse predictions -> IS near num classes.
    logits_conf = np.full((n, c), -50.0)
    for i in range(n):
        logits_conf[i, i % c] = 50.0
    is_c, _ = inception_score_from_logits(logits_conf, splits=4)
    assert is_c == pytest.approx(c, rel=0.05)


def test_precision_recall_identical_sets():
    rng = np.random.RandomState(4)
    f = rng.normal(size=(200, 16))
    p, r = compute_precision_recall(f, f.copy())
    assert p == pytest.approx(1.0)
    assert r == pytest.approx(1.0)


def test_precision_recall_disjoint_sets():
    rng = np.random.RandomState(5)
    real = rng.normal(size=(200, 16))
    gen = rng.normal(loc=100.0, size=(200, 16))
    p, r = compute_precision_recall(real, gen)
    assert p == pytest.approx(0.0)
    assert r == pytest.approx(0.0)


def test_precision_recall_mode_collapse():
    """Generator producing one real mode: precision high, recall low."""
    rng = np.random.RandomState(6)
    real = np.concatenate(
        [rng.normal(0, 0.1, size=(100, 8)), rng.normal(5, 0.1, size=(100, 8))]
    )
    gen = rng.normal(0, 0.1, size=(200, 8))
    p, r = compute_precision_recall(real, gen)
    assert p > 0.8
    assert r < 0.7
    assert p - r > 0.2


def test_diversity_entropy_math():
    assignments = np.array([0, 0, 1, 1])
    entropy, counts, props = diversity_entropy(assignments, 4)
    np.testing.assert_array_equal(counts, [2, 2, 0, 0])
    assert entropy == pytest.approx(np.log(2))


def test_diversity_score_end_to_end():
    rng = np.random.RandomState(7)
    # Reference embeddings with 3 well-separated clusters.
    ref = np.concatenate([rng.normal(c * 10, 0.2, size=(30, 6)) for c in range(3)])
    # Generated embeddings covering only cluster 0 -> entropy ~ 0.
    gen_collapsed = rng.normal(0, 0.2, size=(60, 6))
    out = calculate_diversity_score(ref, gen_collapsed, num_clusters=3)
    assert out["entropy"] == pytest.approx(0.0, abs=1e-6)
    # Generated embeddings covering all clusters evenly -> entropy ~ log 3.
    gen_diverse = np.concatenate(
        [rng.normal(c * 10, 0.2, size=(20, 6)) for c in range(3)]
    )
    out = calculate_diversity_score(ref, gen_diverse, num_clusters=3)
    assert out["entropy"] == pytest.approx(np.log(3), abs=0.05)


def test_inception_v3_shapes():
    """Random-init tower produces the right feature/logit shapes."""
    model = InceptionV3(num_classes=1008)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert out["pool3"].shape == (2, 2048)
    assert out["logits"].shape == (2, 1008)


@pytest.mark.slow
def test_diversity_cli_tiny_blip(tmp_path):
    """calculate_global_scores_diversity end-to-end with the tiny BLIP
    tower: train 2 steps, sample, embed with BLIP-VQA-style extractor
    (reference diversity_score.py:89-91), Ward-cluster, JSONL row."""
    from group_attribution_for_diffusion_models_tpu.cli import (
        calculate_global_scores_diversity as div_cli,
        main as train_main,
    )
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    outdir = str(tmp_path)
    train_main.main([
        "--dataset", "synthetic_16x8", "--method", "retrain",
        "--removal_dist", "full", "--outdir", outdir,
        "--training_steps", "2", "--db", str(tmp_path / "train_db.jsonl"),
    ])
    model_dir = f"{outdir}/synthetic_16x8/retrain/models/full"
    db = str(tmp_path / "div_db.jsonl")
    div_cli.main([
        "--dataset", "synthetic_16x8", "--load", model_dir,
        "--outdir", outdir, "--db", db, "--blip_tiny",
        "--n_samples", "4", "--batch_size", "4", "--num_clusters", "2",
        "--num_inference_steps", "2",
    ])
    rows = list(read_records(db))
    assert len(rows) == 1
    row = rows[0]
    assert np.isfinite(row["entropy"]) and 0.0 <= row["entropy"] <= np.log(2) + 1e-6
    # cluster_count is the per-cluster generated-image counts (the reference's
    # row schema), proportions normalize over the 4 generated samples.
    assert len(row["cluster_count"]) == 2 and sum(row["cluster_count"]) == 4
    assert len(row["cluster_proportions"]) == 2
    assert abs(sum(row["cluster_proportions"]) - 1.0) < 1e-6


@pytest.mark.slow
def test_diversity_cli_precomputed_embeddings(tmp_path):
    """--embeddings_npz path: no model, no tower — pure clustering+entropy."""
    from group_attribution_for_diffusion_models_tpu.cli import (
        calculate_global_scores_diversity as div_cli,
    )
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    rng = np.random.RandomState(0)
    # Two well-separated reference clusters; generated collapses onto one.
    ref = np.concatenate([rng.normal(0, 0.1, (20, 8)),
                          rng.normal(5, 0.1, (20, 8))])
    gen = rng.normal(0, 0.1, (10, 8))
    npz = str(tmp_path / "emb.npz")
    np.savez(npz, ref_emb=ref, gen_emb=gen)
    db = str(tmp_path / "db.jsonl")
    div_cli.main([
        "--dataset", "synthetic_16x8", "--embeddings_npz", npz,
        "--outdir", str(tmp_path), "--db", db, "--num_clusters", "2",
    ])
    row = list(read_records(db))[0]
    assert row["entropy"] < 1e-6  # all generated in one cluster
