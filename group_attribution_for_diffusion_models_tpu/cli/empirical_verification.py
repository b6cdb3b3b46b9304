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
    parser.add_argument("--attributions", action="store_true",
                        help="also fit kernel-SHAP attributions from each "
                             "method's rows and report the correlation of "
                             "the two attribution VECTORS (reference "
                             "empirical_verification.ipynb cell 4: sFT-based "
                             "Shapley vs retrain ground truth)")
    parser.add_argument("--dataset", type=str, default=None,
                        help="needed with --attributions to size the units")
    parser.add_argument("--by_class", action="store_true")
    parser.add_argument("--v1", type=float, default=None,
                        help="full-model behavior (shapley efficiency "
                             "anchor); defaults to behaviors.max(), which "
                             "flips the constraint for loss-like behaviors "
                             "— pass measured anchors when comparing those")
    parser.add_argument("--v0", type=float, default=None,
                        help="null-model behavior anchor (see --v1)")
    return parser.parse_args(argv)


def _attribution_vector(db, cond, num_units, key, by_class, labels, v1, v0):
    from ..attributions import collect_data
    from ..attributions.methods import data_shapley

    masks, behaviors, _ = collect_data(
        db, cond, num_units, key, by_class=by_class, labels=labels
    )
    if len(masks) < num_units + 2:
        raise SystemExit(
            f"--attributions: {cond} has {len(masks)} rows; need at least "
            f"num_units+2 = {num_units + 2} for a determined kernel-SHAP fit"
        )
    v1 = float(behaviors.max() if v1 is None else v1)
    v0 = float(behaviors.min() if v0 is None else v0)
    return data_shapley(num_units, masks, behaviors, v1, v0).ravel()


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

    if args.attributions:
        # Reference empirical_verification.ipynb cell 4: correlation of the
        # Shapley attribution VECTOR fit from the efficient method's rows
        # against the vector fit from retrain rows (the ground truth) —
        # CIFAR 0.763-0.953 / CelebA 0.553-0.829 in BASELINE.md.
        if args.dataset is None:
            raise SystemExit("--attributions requires --dataset")
        from ..data import create_dataset

        dataset = create_dataset(args.dataset, train=True)
        if args.by_class:
            num_units, labels = dataset.num_classes, dataset.labels
        else:
            num_units, labels = len(dataset), None
        vecs = {}
        for method in (args.baseline_method, args.method):
            cond = {"method": method, "removal_dist": args.removal_dist}
            vecs[method] = _attribution_vector(
                args.db, cond, num_units, args.model_behavior_key,
                args.by_class, labels, args.v1, args.v0,
            )
        va = vecs[args.baseline_method]
        vb = vecs[args.method]
        print(
            f"attribution vectors ({num_units} units): "
            f"pearson={pearsonr(va, vb).statistic:.4f} "
            f"spearman={spearmanr(va, vb).statistic:.4f}"
        )


if __name__ == "__main__":
    main()
