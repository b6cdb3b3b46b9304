"""Experiment trackers: wandb / tensorboard / JSONL scalar streams.

The reference logs training scalars to wandb when enabled (reference
unconditional_generation/main.py:604-616,754-764) and through accelerate's
tensorboard/wandb trackers in the SD trainer (reference
train_text_to_image_lora.py:1146,1322). Here one tiny facade serves every
trainer: `make_tracker(kind, ...)` returns an object with `.log(metrics,
step)` and `.finish()`; backends degrade gracefully to the always-available
JSONL stream when the optional package is absent (this image ships neither
wandb nor tensorboard by default — torch's SummaryWriter is used when
importable).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


class NullTracker:
    """Sink that drops everything (kind='none')."""

    def log(self, metrics: Dict, step: int) -> None:
        pass

    def finish(self) -> None:
        pass


class JsonlTracker:
    """Append one {"step", "ts", **metrics} row per log call.

    The in-repo equivalent of the reference's JSONL-database habit
    (SURVEY.md §5.5) applied to training curves; rows are written with a
    single O_APPEND write so concurrent trainers can share a file.
    """

    def __init__(self, path: str, config: Optional[Dict] = None):
        self.path = path
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        if config:
            self._write({"event": "config", **_jsonable(config)})

    def _write(self, row: Dict) -> None:
        data = (json.dumps(row) + "\n").encode()
        fd = os.open(self.path, os.O_WRONLY | os.O_CREAT | os.O_APPEND, 0o644)
        try:
            os.write(fd, data)
        finally:
            os.close(fd)

    def log(self, metrics: Dict, step: int) -> None:
        self._write({"step": int(step), "ts": time.time(), **_jsonable(metrics)})

    def finish(self) -> None:
        pass


class WandbTracker:
    def __init__(self, project: str, run_name: Optional[str], config: Optional[Dict]):
        import wandb  # gated: absent in this image

        self._run = wandb.init(project=project, name=run_name, config=config)

    def log(self, metrics: Dict, step: int) -> None:
        self._run.log(_jsonable(metrics), step=int(step))

    def finish(self) -> None:
        self._run.finish()


class TensorboardTracker:
    def __init__(self, logdir: str, config: Optional[Dict]):
        from torch.utils.tensorboard import SummaryWriter  # torch is baked in

        self._w = SummaryWriter(logdir)
        if config:
            self._w.add_text("config", json.dumps(_jsonable(config)))

    def log(self, metrics: Dict, step: int) -> None:
        for k, v in metrics.items():
            try:
                self._w.add_scalar(k, float(v), int(step))
            except (TypeError, ValueError):
                pass  # non-scalar entries only go to JSONL/wandb

    def finish(self) -> None:
        self._w.close()


def _jsonable(d: Dict) -> Dict:
    out = {}
    for k, v in d.items():
        try:
            json.dumps(v)
            out[k] = v
        except TypeError:
            try:
                out[k] = float(v)
            except (TypeError, ValueError):
                out[k] = str(v)
    return out


def make_tracker(
    kind: str = "none",
    project: str = "group-attribution",
    run_name: Optional[str] = None,
    config: Optional[Dict] = None,
    logdir: Optional[str] = None,
):
    """Build a tracker; unavailable backends fall back to JSONL with a note.

    kinds: none | jsonl | wandb | tensorboard.
    """
    if kind == "none":
        return NullTracker()
    jsonl_path = os.path.join(logdir or ".", f"{run_name or 'metrics'}.jsonl")
    if kind == "jsonl":
        return JsonlTracker(jsonl_path, config)
    if kind == "wandb":
        try:
            return WandbTracker(project, run_name, config)
        except ImportError:
            print("wandb not installed; logging scalars to JSONL instead")
            return JsonlTracker(jsonl_path, config)
    if kind == "tensorboard":
        try:
            return TensorboardTracker(logdir or "tb_logs", config)
        except ImportError:
            print("tensorboard not installed; logging scalars to JSONL instead")
            return JsonlTracker(jsonl_path, config)
    raise ValueError(f"unknown tracker kind: {kind}")
