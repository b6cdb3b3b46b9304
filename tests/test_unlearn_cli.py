"""unlearn CLI end-to-end on synthetic data: iu / gd / ga / lora methods."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'

DATASET = "synthetic_64x8"


@pytest.fixture(scope="module")
def full_dir(tmp_path_factory):
    from group_attribution_for_diffusion_models_tpu.cli import main as train_main

    outdir = str(tmp_path_factory.mktemp("unlearn"))
    train_main.main([
        "--dataset", DATASET, "--method", "retrain", "--removal_dist", "full",
        "--outdir", outdir, "--training_steps", "3",
        "--db", os.path.join(outdir, "db.jsonl"),
    ])
    return outdir, os.path.join(outdir, DATASET, "retrain", "models", "full")


@pytest.mark.parametrize("method", ["gd", "ga", "lora", "iu"])
def test_unlearn_methods(full_dir, method):
    from group_attribution_for_diffusion_models_tpu.cli import unlearn
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    outdir, load = full_dir
    db = os.path.join(outdir, f"unlearn_{method}.jsonl")
    unlearn.main([
        "--dataset", DATASET, "--method", method, "--load", load,
        "--removal_dist", "shapley", "--removal_seed", "1",
        "--outdir", outdir, "--db", db, "--training_steps", "2",
        "--model_behavior", "local", "--n_samples", "2",
        "--num_inference_steps", "2", "--wf_batches", "2", "--batch_size", "8",
    ])
    rows = list(read_records(db))
    assert len(rows) == 1
    assert rows[0]["method"] == method
    assert 0.0 <= rows[0]["avg_ssim"] <= 1.0
    assert rows[0]["unlearn_time"] > 0
