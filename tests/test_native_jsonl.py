"""Native JSONL scanner: build, correctness vs pure-Python, speed sanity."""

import json
import time

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.utils import append_record
from group_attribution_for_diffusion_models_tpu.utils.native_jsonl import (
    filter_records_native,
    native_available,
)


@pytest.fixture(scope="module")
def big_db(tmp_path_factory):
    db = str(tmp_path_factory.mktemp("native") / "db.jsonl")
    rng = np.random.RandomState(0)
    for i in range(300):
        append_record(db, {
            "exp_name": "sweep",
            "method": "retrain" if i % 3 == 0 else "gd",
            "removal_dist": "shapley",
            "removal_seed": i,
            "fid_value": float(rng.rand()),
            "remaining_idx": rng.choice(2000, 1000, replace=False),
        })
    return db


def test_native_builds():
    assert native_available(), "native jsonl scanner failed to build"


def test_native_matches_python(big_db):
    from group_attribution_for_diffusion_models_tpu.utils.jsonl import read_records

    cond = {"method": "retrain", "removal_dist": "shapley"}
    native = filter_records_native(big_db, cond)
    assert native is not None
    python = [
        r for r in read_records(big_db)
        if all(r.get(k) == v for k, v in cond.items())
    ]
    assert len(native) == len(python) == 100
    assert [r["removal_seed"] for r in native] == [r["removal_seed"] for r in python]


def test_native_exact_value_match(big_db):
    native = filter_records_native(big_db, {"removal_seed": 7})
    assert native is not None
    # seed 7 and seed 70/71... share the substring '"removal_seed": 7' prefix:
    # exact re-verification must keep only the true match.
    assert [r["removal_seed"] for r in native] == [7]


def test_native_empty_and_missing(tmp_path):
    assert filter_records_native(str(tmp_path / "nope.jsonl"), {}) is None
    empty = tmp_path / "empty.jsonl"
    empty.write_text("")
    assert filter_records_native(str(empty), {}) is None


def test_filter_records_uses_native(big_db):
    from group_attribution_for_diffusion_models_tpu.utils import filter_records

    rows = filter_records(big_db, {"method": "gd"})
    assert len(rows) == 200
