"""sweep_report and group_distribution: the notebook-analysis counterparts.

Fast tier: pure-numpy JSONL/npy analysis, no JAX."""

import json

import numpy as np

from group_attribution_for_diffusion_models_tpu.utils import append_record


def _sweep_db(path):
    """A (ratio, lr, steps) grid whose best cell is (0.3, 1e-4, 200)."""
    for ratio in (0.1, 0.3, 0.5):
        for lr in (1e-4, 3e-4):
            for steps in (100, 200):
                # ssim peaks at ratio=0.3, lr=1e-4, steps=200.
                ssim = (0.9 - abs(ratio - 0.3) - (0.05 if lr > 1e-4 else 0.0)
                        + (0.02 if steps == 200 else 0.0))
                append_record(path, {
                    "exp_name": f"sweep/ratio={ratio}/lr={lr}",
                    "pruning_ratio": ratio,
                    "lr": lr,
                    "training_steps": steps,
                    **{f"generated_image_{i}_ssim": ssim + 0.001 * i
                       for i in range(3)},
                })


def test_sweep_report_selects_best_cell(tmp_path, capsys):
    from group_attribution_for_diffusion_models_tpu.cli import sweep_report

    db = str(tmp_path / "sweep.jsonl")
    _sweep_db(db)
    out = str(tmp_path / "summary.json")
    summary = sweep_report.main([
        "--db", db, "--keys", "pruning_ratio", "lr", "training_steps",
        "--behavior", "ssim", "--out", out,
    ])
    assert summary["optimal"] == {
        "pruning_ratio": 0.3, "lr": 1e-4, "training_steps": 200}
    assert summary["n_combos"] == 12 and summary["n_rows"] == 12
    # Curves: one per ratio, over steps, at the optimal lr.
    assert set(summary["curves"]) == {"0.1", "0.3", "0.5"}
    assert set(summary["curves"]["0.3"]) == {"100", "200"}
    assert json.load(open(out))["optimal_mean"] == summary["optimal_mean"]
    text = capsys.readouterr().out
    assert "optimal" in text and "pruning_ratio=0.3" in text


def test_sweep_report_exp_name_fallback_and_minimize(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import sweep_report

    db = str(tmp_path / "sweep.jsonl")
    # ratio only lives in exp_name segments (reference DB layout); the
    # behavior is a plain loss column where LOWER is better.
    for ratio, loss in ((0.1, 0.5), (0.3, 0.2), (0.5, 0.9)):
        append_record(db, {"exp_name": f"run/ratio={ratio}/x", "loss": loss})
    summary = sweep_report.main([
        "--db", db, "--keys", "ratio", "--behavior", "loss", "--minimize",
    ])
    assert summary["optimal"] == {"ratio": 0.3}


def test_group_distribution_orders_by_median(tmp_path, capsys):
    from group_attribution_for_diffusion_models_tpu.cli import group_distribution

    # 3 artists, artist 'c' highest-scoring (ArtBench filename convention).
    files = [f"{a}_work-{i}_2020.jpg" for a in "abc" for i in range(4)]
    scores = np.concatenate([
        np.full(4, 1.0), np.full(4, 3.0), np.full(4, 5.0)])
    csv = tmp_path / "filenames.csv"
    csv.write_text("filename\n" + "\n".join(files) + "\n")
    npy = str(tmp_path / "scores.npy")
    np.save(npy, scores)
    out = str(tmp_path / "dist.json")
    rows = group_distribution.main([
        "--scores", npy, "--filenames_csv", str(csv), "--out", out,
    ])
    assert [r["group"] for r in rows] == ["c", "b", "a"]
    assert rows[0]["median"] == 5.0 and rows[0]["count"] == 4
    assert len(json.load(open(out))) == 3
    assert "c: median=5.0000" in capsys.readouterr().out


def test_group_distribution_dataset_labels(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import group_distribution
    from group_attribution_for_diffusion_models_tpu.data import create_dataset

    ds = create_dataset("synthetic_64x8", train=True)
    scores = ds.labels.astype(np.float64) * 2.0  # score == 2 * class
    npy = str(tmp_path / "scores.npy")
    np.save(npy, scores)
    rows = group_distribution.main([
        "--scores", npy, "--dataset", "synthetic_64x8"])
    n_groups = int(ds.labels.max()) + 1
    assert len(rows) == n_groups
    assert rows[0]["group"] == str(n_groups - 1)  # highest class on top
