"""Empirical verification that sparse fine-tuning approximates retraining.

Equivalent of reference notebooks/empirical_verification.ipynb and
sparsified_ft_approximation.ipynb (SURVEY.md §4.4): for subsets scored by
both the baseline method (retrain) and the efficient method (sparse-FT /
gd), report Pearson and Spearman correlation of their behaviors, matched by
removal seed — the fidelity number behind the paper's "sFT ~= retrain"
claim (0.739-0.879 on CIFAR at 500-3000 steps, BASELINE.md).
"""

from __future__ import annotations

import argparse

import numpy as np
from scipy.stats import pearsonr, spearmanr

from ..utils.jsonl import filter_records


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--db", type=str, required=True)
    parser.add_argument("--baseline_method", type=str, default="retrain")
    parser.add_argument("--method", type=str, default="prune_fine_tune")
    parser.add_argument("--removal_dist", type=str, default="shapley")
    parser.add_argument("--model_behavior_key", type=str, default="fid_value")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)

    def seed_map(method):
        rows = filter_records(
            args.db, {"method": method, "removal_dist": args.removal_dist}
        )
        return {
            int(r["removal_seed"]): float(r[args.model_behavior_key])
            for r in rows
            if r.get(args.model_behavior_key) is not None
            and r.get("removal_seed") is not None
        }

    base = seed_map(args.baseline_method)
    meth = seed_map(args.method)
    shared = sorted(set(base) & set(meth))
    if len(shared) < 3:
        raise SystemExit(
            f"need >=3 shared removal seeds; found {len(shared)} "
            f"(baseline {len(base)}, method {len(meth)})"
        )
    a = np.asarray([base[s] for s in shared])
    b = np.asarray([meth[s] for s in shared])
    print(
        f"{args.method} vs {args.baseline_method} on "
        f"{args.model_behavior_key} ({len(shared)} seeds): "
        f"pearson={pearsonr(a, b).statistic:.4f} "
        f"spearman={spearmanr(a, b).statistic:.4f} "
        f"mse={float(np.mean((a - b) ** 2)):.6f}"
    )


if __name__ == "__main__":
    main()
