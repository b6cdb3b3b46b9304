"""Checkpoint/resume: orbax-backed train-state persistence.

The reference's checkpoint ABI (SURVEY.md §5.4) is
``ckpt_steps_%08d.pt`` = {unet, unet_ema, optimizer, lr_scheduler,
remaining_idx, removed_idx, total_steps_time}
(reference unconditional_generation/main.py:827-841), with latest-checkpoint
discovery by filename scan (get_max_steps, src/utils.py:64-76) and
corrupted-checkpoint recovery by wipe-and-reinit (main.py:360-381).

Here the whole TrainState pytree (params, EMA, optimizer state, step) plus
the removal indices and timing metadata checkpoint as one orbax save;
pruned architectures persist as **spec + params** (the spec's
pruned_channels), never pickled modules.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config.registry import UNetSpec
from ..training.state import TrainState

_STEP_RE = re.compile(r"ckpt_steps_(\d{8})$")


def ckpt_dir_for_step(model_dir: str, step: int) -> str:
    return os.path.join(model_dir, f"ckpt_steps_{step:08d}")


def get_max_steps(model_dir: str) -> Optional[int]:
    """Latest checkpointed step by directory-name scan (reference
    src/utils.py:64-76)."""
    if not os.path.isdir(model_dir):
        return None
    steps = [
        int(m.group(1))
        for name in os.listdir(model_dir)
        if (m := _STEP_RE.match(name))
    ]
    return max(steps) if steps else None


def save_checkpoint(
    model_dir: str,
    step: int,
    state: TrainState,
    remaining_idx: Optional[np.ndarray] = None,
    removed_idx: Optional[np.ndarray] = None,
    total_steps_time: float = 0.0,
    unet_spec: Optional[UNetSpec] = None,
) -> str:
    """Save state + provenance; returns the checkpoint path."""
    path = ckpt_dir_for_step(model_dir, step)
    if os.path.exists(path):
        shutil.rmtree(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(path, "state")),
        jax.tree_util.tree_map(np.asarray, dataclasses.asdict(state)),
    )
    ckptr.wait_until_finished()
    meta: Dict[str, Any] = {"step": int(step), "total_steps_time": total_steps_time}
    if remaining_idx is not None:
        meta["remaining_idx"] = np.asarray(remaining_idx).tolist()
    if removed_idx is not None:
        meta["removed_idx"] = np.asarray(removed_idx).tolist()
    if unet_spec is not None:
        spec_dict = dataclasses.asdict(unet_spec)
        if spec_dict.get("pruned_channels") is not None:
            spec_dict["pruned_channels"] = dict(spec_dict["pruned_channels"])
        meta["unet_spec"] = spec_dict
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(
    model_dir: str,
    abstract_state: TrainState,
    step: Optional[int] = None,
) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore (state, meta); step=None loads the latest.

    Raises FileNotFoundError when no checkpoint exists, ValueError on a
    corrupted checkpoint — callers implement the reference's wipe-and-reinit
    recovery on ValueError.
    """
    if step is None:
        step = get_max_steps(model_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {model_dir}")
    path = ckpt_dir_for_step(model_dir, step)
    try:
        ckptr = ocp.StandardCheckpointer()
        template = jax.tree_util.tree_map(
            np.asarray, dataclasses.asdict(abstract_state)
        )
        restored = ckptr.restore(
            os.path.abspath(os.path.join(path, "state")), template
        )
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
    except FileNotFoundError:
        raise
    except Exception as e:  # corrupted checkpoint
        raise ValueError(f"corrupted checkpoint at {path}: {e}") from e
    state = TrainState(
        params=restored["params"],
        ema_params=restored["ema_params"],
        opt_state=jax.tree_util.tree_unflatten(
            jax.tree_util.tree_structure(abstract_state.opt_state),
            jax.tree_util.tree_leaves(restored["opt_state"]),
        ),
        step=restored["step"],
    )
    return state, meta


def load_meta(model_dir: str, step: Optional[int] = None) -> Dict[str, Any]:
    """Read just a checkpoint's meta.json (no state restore).

    Lets callers discover the stored UNetSpec *before* building the model /
    probe params — required when the checkpoint holds a pruned architecture
    whose shapes differ from the dataset's default config.
    """
    if step is None:
        step = get_max_steps(model_dir)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {model_dir}")
    with open(os.path.join(ckpt_dir_for_step(model_dir, step), "meta.json")) as f:
        return json.load(f)


def load_unet_spec(meta: Dict[str, Any]) -> Optional[UNetSpec]:
    """Rebuild the UNetSpec stored in checkpoint metadata."""
    if "unet_spec" not in meta:
        return None
    d = dict(meta["unet_spec"])
    for key in ("block_out_channels", "down_block_types", "up_block_types"):
        d[key] = tuple(d[key])
    return UNetSpec(**d)


def resume_or_init(
    model_dir: str,
    init_state: TrainState,
) -> Tuple[TrainState, Dict[str, Any], bool]:
    """(state, meta, resumed): latest checkpoint, with corrupted-checkpoint
    recovery by wiping the model dir (reference main.py:360-381)."""
    try:
        state, meta = load_checkpoint(model_dir, init_state)
        return state, meta, True
    except FileNotFoundError:
        return init_state, {}, False
    except ValueError:
        shutil.rmtree(model_dir, ignore_errors=True)
        return init_state, {}, False
