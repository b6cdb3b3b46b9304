"""JSONL experiment-DB tests."""

import numpy as np

from group_attribution_for_diffusion_models_tpu.utils import (
    append_record,
    filter_records,
    has_record,
    merge_shards,
    read_records,
    shard_path,
)


def test_roundtrip_and_numpy_coercion(tmp_path):
    db = str(tmp_path / "db.jsonl")
    append_record(db, {"a": np.int64(3), "b": np.float32(0.5), "idx": np.arange(3)})
    rows = list(read_records(db))
    assert rows == [{"a": 3, "b": 0.5, "idx": [0, 1, 2]}]


def test_filter_and_duplicate_guard(tmp_path):
    db = str(tmp_path / "db.jsonl")
    append_record(db, {"method": "retrain", "seed": 1, "fid_value": 10.0})
    append_record(db, {"method": "gd", "seed": 1, "fid_value": 12.0})
    assert len(filter_records(db, {"method": "retrain"})) == 1
    assert has_record(db, {"method": "gd", "seed": 1})
    assert not has_record(db, {"method": "gd", "seed": 2})


def test_corrupt_line_skipped(tmp_path):
    db = str(tmp_path / "db.jsonl")
    append_record(db, {"ok": 1})
    with open(db, "a") as f:
        f.write('{"torn": \n')
    append_record(db, {"ok": 2})
    assert [r["ok"] for r in read_records(db)] == [1, 2]


def test_shard_merge(tmp_path):
    db = str(tmp_path / "db.jsonl")
    for s in range(3):
        append_record(shard_path(db, s), {"shard": s})
    n = merge_shards(db)
    assert n == 3
    assert sorted(r["shard"] for r in read_records(db)) == [0, 1, 2]
