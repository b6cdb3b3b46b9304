"""Tracker facade: JSONL backend, graceful fallbacks, CLI wiring."""

import json
import os

from group_attribution_for_diffusion_models_tpu.utils.trackers import (
    JsonlTracker,
    NullTracker,
    make_tracker,
)


def test_jsonl_tracker_appends_rows(tmp_path):
    path = str(tmp_path / "m.jsonl")
    t = JsonlTracker(path, config={"lr": 1e-4, "dataset": "cifar"})
    t.log({"loss": 0.5, "grad_norm": 1.25}, step=1)
    t.log({"loss": 0.25}, step=2)
    t.finish()
    rows = [json.loads(l) for l in open(path)]
    assert rows[0]["event"] == "config" and rows[0]["lr"] == 1e-4
    assert rows[1] == {**rows[1], "step": 1, "loss": 0.5}
    assert rows[2]["step"] == 2


def test_jsonl_tracker_coerces_nonjson_values(tmp_path):
    import numpy as np

    path = str(tmp_path / "m.jsonl")
    t = JsonlTracker(path)
    t.log({"loss": np.float32(0.125), "arr": np.arange(2)}, step=0)
    row = json.loads(open(path).read())
    assert row["loss"] == 0.125
    assert isinstance(row["arr"], str)  # stringified, not dropped


def test_make_tracker_kinds(tmp_path):
    assert isinstance(make_tracker("none"), NullTracker)
    t = make_tracker("jsonl", run_name="r", logdir=str(tmp_path))
    t.log({"a": 1}, 0)
    assert os.path.exists(tmp_path / "r.jsonl")
    # wandb absent in this image -> JSONL fallback, never an exception
    t2 = make_tracker("wandb", run_name="w", logdir=str(tmp_path))
    t2.log({"a": 1}, 0)
