"""calculate_local_loss: per-timestep paired behaviors end-to-end."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'


def test_per_timestep_local_loss(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import (
        calculate_local_loss,
        main as train_main,
    )
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    outdir = str(tmp_path)
    db = os.path.join(outdir, "db.jsonl")
    train_main.main([
        "--dataset", "synthetic_64x8", "--method", "retrain",
        "--removal_dist", "full", "--outdir", outdir, "--training_steps", "2",
        "--db", db,
    ])
    full_dir = os.path.join(outdir, "synthetic_64x8", "retrain", "models", "full")
    train_main.main([
        "--dataset", "synthetic_64x8", "--method", "retrain",
        "--removal_dist", "shapley", "--removal_seed", "3",
        "--outdir", outdir, "--training_steps", "2", "--db", db,
    ])
    sub_dir = os.path.join(
        outdir, "synthetic_64x8", "retrain", "models", "shapley", "shapley_seed=3"
    )

    calculate_local_loss.main([
        "--dataset", "synthetic_64x8", "--full_model_dir", full_dir,
        "--removal_model_dir", sub_dir, "--outdir", outdir, "--db", db,
        "--n_samples", "2", "--num_inference_steps", "3",
    ])
    rows = [r for r in read_records(db) if "per_step_mse" in r]
    assert len(rows) == 1
    assert len(rows[0]["per_step_mse"]) == 3
    assert len(rows[0]["per_step_ssim"]) == 3
    assert all(np.isfinite(v) for v in rows[0]["per_step_mse"])
    assert rows[0]["timesteps"] == sorted(rows[0]["timesteps"], reverse=True)
