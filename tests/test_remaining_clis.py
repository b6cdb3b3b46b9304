"""Smoke coverage for the last untested CLI mirrors: loo/aoi LDS,
create_metadata, generate_samples_tti, calculate_global_scores (sample-dir
mode)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'


def _behavior_rows(dist, n, d, rng, flip=None):
    rows = []
    for i in range(n):
        if dist == "loo":
            m = np.ones(d, int)
            m[i % d] = 0
        elif dist == "aoi":
            m = np.zeros(d, int)
            m[i % d] = 1
        else:
            m = (rng.rand(d) > 0.5).astype(int)
        y = 1.0 + 0.1 * m.sum() / d + rng.normal(scale=0.01)
        rows.append({
            "dataset": "artbench", "method": "retrain", "removal_dist": dist,
            "remaining_idx": np.flatnonzero(m).tolist(),
            "removed_idx": np.flatnonzero(m == 0).tolist(),
            "aesthetic_score_avg": float(y),
            "kept_units": np.flatnonzero(m).tolist(),
        })
    return rows


def test_loo_and_aoi_lds(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import aoi_lds, loo_lds

    rng = np.random.RandomState(0)
    d = 8
    db = str(tmp_path / "db.jsonl")
    with open(db, "w") as f:
        for r in (_behavior_rows("loo", 8, d, rng)
                  + _behavior_rows("aoi", 8, d, rng)
                  + _behavior_rows("datamodel", 12, d, rng)):
            f.write(json.dumps(r) + "\n")
    loo_lds.main(["--train_db", db, "--test_db", db, "--num_groups", str(d),
                  "--model_behavior_key", "aesthetic_score_avg",
                  "--train_size_step", "8"])
    aoi_lds.main(["--train_db", db, "--test_db", db, "--num_groups", str(d),
                  "--model_behavior_key", "aesthetic_score_avg",
                  "--train_size_step", "8"])


def test_create_metadata(tmp_path):
    from PIL import Image

    from group_attribution_for_diffusion_models_tpu.cli import create_metadata

    rng = np.random.RandomState(0)
    d = tmp_path / "post_impressionism"
    d.mkdir()
    for artist in ("vincent-van-gogh", "paul-gauguin"):
        for i in range(3):
            arr = rng.randint(0, 256, (16, 16, 3), np.int64).astype(np.uint8)
            Image.fromarray(arr).save(d / f"{artist}_work-{i}.jpg")
    create_metadata.main([
        "--image_dir", str(d), "--style", "post_impressionism",
        "--expected_count", "6", "--out_dir", str(tmp_path),
    ])
    meta = (tmp_path / "metadata.csv").read_text().splitlines()
    assert len(meta) == 7  # header + 6 rows
    artists = (tmp_path / "post_impressionism_artists.csv").read_text()
    assert "vincent-van-gogh" in artists and "paul-gauguin" in artists


def test_generate_samples_tti_resumable(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import (
        generate_samples_tti,
    )

    out = str(tmp_path / "samples")
    argv = [
        "--dataset", "synthetic_32x8", "--styles", "post_impressionism",
        "--n_samples_per_style", "2", "--batch_size", "2",
        "--num_inference_steps", "2", "--sample_outdir", out,
    ]
    generate_samples_tti.main(argv)
    pngs = [f for f in os.listdir(os.path.join(out, "post_impressionism"))
            if f.endswith(".png")]
    assert len(pngs) == 2
    # Second invocation resumes (completed labels recorded) without error.
    generate_samples_tti.main(argv)


def test_calculate_global_scores_sample_dir(tmp_path):
    from PIL import Image

    from group_attribution_for_diffusion_models_tpu.cli import (
        calculate_global_scores,
    )
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    rng = np.random.RandomState(0)
    d = tmp_path / "samples"
    d.mkdir()
    for i in range(4):
        arr = rng.randint(0, 256, (8, 8, 3), np.int64).astype(np.uint8)
        Image.fromarray(arr).save(d / f"s_{i}.png")
    db = str(tmp_path / "db.jsonl")
    calculate_global_scores.main([
        "--dataset", "synthetic_16x8", "--sample_dir", str(d),
        "--n_samples", "4", "--batch_size", "4",
        "--outdir", str(tmp_path), "--db", db,
    ])
    rows = list(read_records(db))
    assert len(rows) == 1
    assert np.isfinite(rows[0]["fid_value"])
    # IS over 4 samples with the default split count is degenerate (nan);
    # presence of the key is what this smoke checks.
    assert "is" in rows[0]
