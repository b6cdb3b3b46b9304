"""Linear Datamodeling Score (LDS) evaluation.

The end-to-end quality metric of the whole pipeline: Spearman rank
correlation (x100) between attribution-predicted subset behaviors
(mask @ attrs) and actually-retrained subset behaviors on held-out datamodel
subsets, averaged over test DBs with a 1.96-SE interval
(reference lds.py:158-170, text_to_image/shapley_lds.py:138-150).

`collect_data` mirrors the reference's JSONL-row filtering contract
(reference lds.py:203-266): rows are selected by a condition dict over the
recorded CLI args, masks are rebuilt from `remaining_idx` (or re-derived from
`removal_seed` when absent — the determinism contract of data.removal), and
optionally collapsed to class granularity.
"""

from __future__ import annotations

from typing import List, Mapping, Optional, Sequence, Tuple

import numpy as np
from scipy.stats import spearmanr

from ..data.removal import sample_removal
from ..utils.jsonl import filter_records


def evaluate_lds(
    attrs_all: np.ndarray,
    test_data_list: Sequence[Tuple[np.ndarray, np.ndarray]],
    num_model_behaviors: int = 1,
) -> Tuple[float, float]:
    """Mean LDS x100 and 1.96-SE CI across test DBs (reference lds.py:158-170)."""
    attrs_all = np.asarray(attrs_all)
    if attrs_all.ndim == 1:
        attrs_all = attrs_all[None, :]
    lds_list = []
    for x_test, y_test in test_data_list:
        y_test = np.asarray(y_test)
        if y_test.ndim == 1:
            y_test = y_test[:, None]
        per_behavior = [
            spearmanr(x_test @ attrs_all[k], y_test[:, k]).statistic * 100
            for k in range(num_model_behaviors)
        ]
        lds_list.append(np.mean(per_behavior))
    lds_mean = float(np.mean(lds_list))
    lds_ci = float(np.std(lds_list) / np.sqrt(len(lds_list)) * 1.96)
    return lds_mean, lds_ci


def collect_data(
    db_path: str,
    condition: Mapping,
    num_units: int,
    behavior_key: str,
    by_class: bool = False,
    labels: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """(masks, behaviors, seeds) from a JSONL DB (reference lds.py:203-266).

    num_units is the mask dimension: dataset size, or number of classes/groups
    when by_class (then `labels` maps datum index -> class).
    """
    rows = filter_records(db_path, condition)
    masks, behaviors, seeds = [], [], []
    for rec in rows:
        if behavior_key not in rec or rec[behavior_key] is None:
            continue
        remaining = rec.get("remaining_idx")
        if remaining is None:
            # Re-derive from the seed — the determinism contract.
            remaining, _ = sample_removal(
                rec["removal_dist"],
                num_units if labels is None else labels,
                seed=int(rec["removal_seed"]),
                alpha=float(rec.get("datamodel_alpha", 0.5)),
                by_class=by_class and labels is not None,
            )
        remaining = np.asarray(remaining, dtype=np.int64)
        mask = np.zeros(num_units, dtype=np.float32)
        if by_class and labels is not None:
            remaining_classes = np.unique(np.asarray(labels)[remaining])
            mask[remaining_classes] = 1.0
        else:
            mask[remaining] = 1.0
        masks.append(mask)
        behaviors.append(float(rec[behavior_key]))
        seeds.append(int(rec.get("removal_seed", -1)))
    if not masks:
        return (
            np.zeros((0, num_units), np.float32),
            np.zeros((0,), np.float64),
            [],
        )
    return np.stack(masks), np.asarray(behaviors), seeds


def collect_local_data(
    db_path: str,
    condition: Mapping,
    num_units: int,
    behavior_key: str,
    n_samples: int,
    by_class: bool = False,
    labels: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, List[int]]:
    """(masks, behaviors (n_rows, n_samples), seeds) for per-image local
    behaviors: columns are ``generated_image_{i}_{behavior_key}``
    (reference lds.py local-behavior mode, keyed per generated image).
    """
    rows = filter_records(db_path, condition)
    masks, behaviors, seeds = [], [], []
    keys = [f"generated_image_{i}_{behavior_key}" for i in range(n_samples)]
    for rec in rows:
        if any(k not in rec or rec[k] is None for k in keys):
            continue
        remaining = rec.get("remaining_idx")
        if remaining is None:
            remaining, _ = sample_removal(
                rec["removal_dist"],
                num_units if labels is None else labels,
                seed=int(rec["removal_seed"]),
                alpha=float(rec.get("datamodel_alpha", 0.5)),
                by_class=by_class and labels is not None,
            )
        mask = np.zeros(num_units, dtype=np.float32)
        remaining = np.asarray(remaining, dtype=np.int64)
        if by_class and labels is not None:
            mask[np.unique(np.asarray(labels)[remaining])] = 1.0
        else:
            mask[remaining] = 1.0
        masks.append(mask)
        behaviors.append([float(rec[k]) for k in keys])
        seeds.append(int(rec.get("removal_seed", -1)))
    if not masks:
        return (
            np.zeros((0, num_units), np.float32),
            np.zeros((0, n_samples), np.float64),
            [],
        )
    return np.stack(masks), np.asarray(behaviors), seeds


def bootstrap_lds_ci(
    attrs: np.ndarray,
    x_test: np.ndarray,
    y_test: np.ndarray,
    num_iters: int = 100,
    seed: int = 0,
) -> Tuple[float, float, float]:
    """Bootstrap mean/low/high (2.5%-97.5%) of LDS over test-row resamples
    (reference lds.py:458-486)."""
    rng = np.random.RandomState(seed)
    n = len(x_test)
    vals = []
    for _ in range(num_iters):
        idx = rng.choice(n, n, replace=True)
        vals.append(spearmanr(x_test[idx] @ attrs, y_test[idx]).statistic * 100)
    vals = np.asarray(vals)
    return float(vals.mean()), float(np.percentile(vals, 2.5)), float(
        np.percentile(vals, 97.5)
    )
