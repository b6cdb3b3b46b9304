"""ctypes bridge to the native JSONL scanner (native/jsonl_scan.cpp).

`filter_records_native` is a drop-in fast path for utils.jsonl.filter_records:
the C++ library mmaps the DB, substring-prefilters rows on the serialized
'"key": value' condition pairs, and Python json-parses only the candidates,
re-verifying conditions exactly (the substring pass is a sound
over-approximation). Builds on demand with `make`; silently unavailable
(None) when the toolchain or .so is missing, in which case callers fall back
to the pure-Python scan.
"""

from __future__ import annotations

import ctypes
import json
import os
import subprocess
from typing import Any, Dict, List, Mapping, Optional

_NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)
_SO_PATH = os.path.join(_NATIVE_DIR, "libjsonl_scan.so")

_lib = None
_load_attempted = False


def _ensure_built() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _lib is not None or _load_attempted:
        return _lib
    _load_attempted = True
    if not os.path.exists(_SO_PATH):
        try:
            subprocess.run(
                ["make", "-C", _NATIVE_DIR],
                check=True, capture_output=True, timeout=120,
            )
        except Exception:
            return None
    try:
        lib = ctypes.CDLL(_SO_PATH)
        lib.jsonl_open.argtypes = [ctypes.c_char_p]
        lib.jsonl_open.restype = ctypes.c_int
        lib.jsonl_close.argtypes = [ctypes.c_int]
        lib.jsonl_count_lines.argtypes = [ctypes.c_int]
        lib.jsonl_count_lines.restype = ctypes.c_int64
        lib.jsonl_filter.argtypes = [
            ctypes.c_int, ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ]
        lib.jsonl_filter.restype = ctypes.c_int64
        lib.jsonl_read_range.argtypes = [
            ctypes.c_int, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p
        ]
        lib.jsonl_read_range.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def native_available() -> bool:
    return _ensure_built() is not None


def _condition_needles(condition: Mapping[str, Any]) -> bytes:
    """Serialize conditions as the exact '"key": value' byte patterns our
    json.dumps writer produces."""
    parts = []
    for k, v in condition.items():
        parts.append(f'"{k}": {json.dumps(v)}'.encode())
    return b"\x00".join(parts) + b"\x00"


def filter_records_native(
    db_path: str, condition: Mapping[str, Any]
) -> Optional[List[Dict[str, Any]]]:
    """Native-accelerated filter; None when the native path is unavailable."""
    lib = _ensure_built()
    if lib is None or not os.path.exists(db_path) or os.path.getsize(db_path) == 0:
        return None
    fid = lib.jsonl_open(db_path.encode())
    if fid < 0:
        return None
    try:
        needles = _condition_needles(condition) if condition else b"\x00"
        num = len(condition) if condition else 0
        cap = 4096
        while True:
            buf = (ctypes.c_int64 * (2 * cap))()
            n = lib.jsonl_filter(fid, needles, num, buf, cap)
            if n < 0:
                return None
            if n <= cap:
                break
            cap = int(n)
        out: List[Dict[str, Any]] = []
        for i in range(int(n)):
            start, length = buf[2 * i], buf[2 * i + 1]
            raw = ctypes.create_string_buffer(int(length))
            lib.jsonl_read_range(fid, start, length, raw)
            try:
                rec = json.loads(raw.raw.decode("utf-8"))
            except (json.JSONDecodeError, UnicodeDecodeError):
                continue
            # Exact re-verification: the substring pass over-approximates.
            if all(rec.get(k) == v for k, v in condition.items()):
                out.append(rec)
        return out
    finally:
        lib.jsonl_close(fid)
