"""Exhaustive ground-truth Shapley CLI drives end to end at smoke scale.

Mirrors reference empirical_verification.ipynb cell 4 (estimate quality vs
ground truth), except the ground truth here is the EXACT game from
enumerating all 2^C - 1 class subsets as ensemble retrains.
"""

import json
import os

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.cli import shapley_groundtruth

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'


def test_groundtruth_smoke(tmp_path):
    out = str(tmp_path)
    shapley_groundtruth.main([
        "--dataset", "synthetic_64x8_c4_tpl_mix",
        "--training_steps", "2", "--chunk_size", "8",
        "--fit_counts", "4", "--num_estimate_seeds", "1",
        "--outdir", out,
    ])
    db = os.path.join(out, "synthetic_64x8_c4_tpl_mix_groundtruth_db.jsonl")
    rows = [json.loads(line) for line in open(db)]
    enum_rows = [r for r in rows if r.get("removal_dist") == "enum"]
    assert len(enum_rows) == 15  # 2^4 - 1 non-empty subsets
    # Every enumerated subset keeps a distinct image set.
    kept = {tuple(r["remaining_idx"]) for r in enum_rows}
    assert len(kept) == 15
    summary = [r for r in rows
               if r.get("removal_dist") == "groundtruth_summary"]
    assert summary and summary[0]["num_enumerated"] == 15
    assert summary[0]["convergence"][0]["fit_subsets"] == 4
    exact = np.load(os.path.join(out, "shapley_groundtruth_exact.npy"))
    assert exact.shape == (4,) and np.isfinite(exact).all()


def test_groundtruth_rejects_wide_games(tmp_path):
    with pytest.raises(SystemExit, match="subsets"):
        shapley_groundtruth.main([
            "--dataset", "synthetic_256x8_c13_tpl_mix",
            "--outdir", str(tmp_path),
        ])


def test_enum_requires_masks(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble

    with pytest.raises(SystemExit, match="removal_masks"):
        train_ensemble.main([
            "--dataset", "synthetic_64x8", "--removal_dist", "enum",
            "--num_seeds", "2", "--outdir", str(tmp_path),
        ])


def test_removal_masks_width_validation(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble

    bad = np.zeros((2, 7), np.int8)
    bad[:, 0] = 1
    path = tmp_path / "masks.npy"
    np.save(path, bad)
    with pytest.raises(SystemExit, match="width"):
        train_ensemble.main([
            "--dataset", "synthetic_64x8", "--removal_dist", "enum",
            "--removal_masks", str(path), "--num_seeds", "2",
            "--outdir", str(tmp_path),
        ])


def test_image_level_masks_train(tmp_path):
    """Image-level explicit masks (width = len(dataset)) train end to end."""
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble

    rng = np.random.RandomState(0)
    masks = (rng.rand(2, 64) > 0.5).astype(np.int8)
    masks[:, 0] = 1  # keep non-empty
    path = tmp_path / "masks.npy"
    np.save(path, masks)
    db = str(tmp_path / "db.jsonl")
    train_ensemble.main([
        "--dataset", "synthetic_64x8", "--removal_dist", "enum",
        "--removal_masks", str(path), "--num_seeds", "2",
        "--training_steps", "2", "--batch_size", "4",
        "--outdir", str(tmp_path), "--db", db,
    ])
    rows = [json.loads(line) for line in open(db)]
    assert len(rows) == 2
    for s, rec in enumerate(rows):
        np.testing.assert_array_equal(
            np.sort(rec["remaining_idx"]), np.flatnonzero(masks[s])
        )
