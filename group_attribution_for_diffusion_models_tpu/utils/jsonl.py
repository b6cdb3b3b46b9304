"""Append-only JSONL experiment databases.

The reference's sole interface between the training/scoring tier and the
attribution tier is append-only JSONL files whose rows are
``vars(args) + scores + remaining_idx/removed_idx + timings``
(reference unconditional_generation/main.py:790-800, unlearn.py:960-969,
lds.py:203-266). The row schema is preserved here — LDS scripts key on names
like ``fid_value``, ``entropy``, ``remaining_idx``, ``removal_seed``.

The reference appends from concurrent SLURM jobs and prays for atomicity
(SURVEY.md §5.2). With an in-process ensemble axis that is untenable, so this
module adds (a) O_APPEND single-write rows (atomic on POSIX for rows < PIPE_BUF
and safe in practice for local files), (b) per-shard DB files with a merge
helper for in-process concurrent writers, and (c) the duplicate-record guard
from reference compute_model_behaviors.py:169-191.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Iterator, List, Mapping, Optional


class _NumpyEncoder(json.JSONEncoder):
    def default(self, o):
        import numpy as np

        if isinstance(o, np.integer):
            return int(o)
        if isinstance(o, np.floating):
            return float(o)
        if isinstance(o, np.ndarray):
            return o.tolist()
        return super().default(o)


def append_record(db_path: str, record: Mapping[str, Any]) -> None:
    """Append one JSON row as a single O_APPEND write."""
    os.makedirs(os.path.dirname(os.path.abspath(db_path)), exist_ok=True)
    line = json.dumps(record, cls=_NumpyEncoder) + "\n"
    with open(db_path, "a", encoding="utf-8") as f:
        f.write(line)
        f.flush()


def read_records(db_path: str) -> Iterator[Dict[str, Any]]:
    """Iterate rows, skipping torn/corrupt lines (append-and-pray legacy DBs)."""
    if not os.path.exists(db_path):
        return
    with open(db_path, "r", encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except json.JSONDecodeError:
                continue


def filter_records(
    db_path: str, condition: Mapping[str, Any]
) -> List[Dict[str, Any]]:
    """Rows matching every (key, value) in `condition` (reference lds.py:203-266).

    Uses the native mmap scanner (native/jsonl_scan.cpp) when built — it
    substring-prefilters rows before any JSON parsing — and falls back to
    the pure-Python scan otherwise.
    """
    from .native_jsonl import filter_records_native

    native = filter_records_native(db_path, condition)
    if native is not None:
        return native
    out = []
    for rec in read_records(db_path):
        if all(rec.get(k) == v for k, v in condition.items()):
            out.append(rec)
    return out


def has_record(db_path: str, condition: Mapping[str, Any]) -> bool:
    """Duplicate guard (reference compute_model_behaviors.py:169-191)."""
    for rec in read_records(db_path):
        if all(rec.get(k) == v for k, v in condition.items()):
            return True
    return False


def shard_path(db_path: str, shard: int) -> str:
    base, ext = os.path.splitext(db_path)
    return f"{base}.shard{shard:04d}{ext}"


def merge_shards(db_path: str, num_shards: Optional[int] = None) -> int:
    """Merge per-shard DB files into the main DB; returns rows merged.

    Shard files are discovered by the shard_path pattern when num_shards is
    None. Merged shards are removed.
    """
    import glob

    base, ext = os.path.splitext(db_path)
    if num_shards is None:
        shards = sorted(glob.glob(f"{base}.shard*{ext}"))
    else:
        shards = [shard_path(db_path, s) for s in range(num_shards)]
    count = 0
    for sp in shards:
        if not os.path.exists(sp):
            continue
        for rec in read_records(sp):
            append_record(db_path, rec)
            count += 1
        os.remove(sp)
    return count
