"""Post-hoc LDS convergence curve for the reference-protocol-scale run.

Reads the shapley_pipeline JSONL DB written by scripts/refscale_attribution.sh
and refits closed-form KernelSHAP on growing prefixes of the paired-Shapley
fit rows (the reference's convergence question, shapley_convergence.py:80,
asked of real retrain rows rather than resampled estimates), evaluating
Spearman LDS of each prefix fit against the full datamodel test set.
CPU-only; run after the pipeline completes.

  python scripts/refscale_prefix_curve.py /tmp/refscale/<db>.jsonl <dataset>
"""

import json
import sys

import numpy as np

sys.path.insert(0, ".")

from group_attribution_for_diffusion_models_tpu.attributions.lds import (  # noqa: E402
    evaluate_lds,
)
from group_attribution_for_diffusion_models_tpu.attributions.methods.datashapley import (  # noqa: E402
    data_shapley,
)
from group_attribution_for_diffusion_models_tpu.data import create_dataset  # noqa: E402
from group_attribution_for_diffusion_models_tpu.utils.jsonl import (  # noqa: E402
    filter_records,
)


def rows_to_xy(db, dataset, dist, lo, hi, n_units, labels, behavior,
               method="retrain", steps=None):
    # Method + step budget are part of the row identity: after a sparse-FT
    # comparison run the SAME DB holds prune_fine_tune rows for the same
    # (dist, seed) windows — mixing families here would corrupt the curve.
    masks, ys = [], []
    for rec in filter_records(db, {"dataset": dataset, "removal_dist": dist,
                                   "method": method}):
        if rec.get(behavior) is None:
            continue
        if steps is not None and rec.get("training_steps", steps) != steps:
            continue
        seed = rec.get("removal_seed")
        if seed is None or not (lo <= int(seed) < hi):
            continue
        remaining = np.asarray(rec["remaining_idx"], np.int64)
        m = np.zeros(n_units, np.float32)
        m[np.unique(labels[remaining])] = 1.0
        masks.append((int(seed), m))
        ys.append((int(seed), float(rec[behavior])))
    masks.sort(key=lambda t: t[0])
    ys.sort(key=lambda t: t[0])
    return np.stack([m for _, m in masks]), np.asarray([y for _, y in ys])


def main():
    db = sys.argv[1]
    dataset = sys.argv[2] if len(sys.argv) > 2 else "synthetic_2048x32_c32_tpl_mix_sizes"
    # argv[3]: fit-row step budget; argv[4]: fit-row method (retrain default).
    method = sys.argv[4] if len(sys.argv) > 4 else "retrain"
    behavior = "eval_loss"
    ds = create_dataset(dataset, train=True)
    labels = np.asarray(ds.labels)
    n_units = int(labels.max()) + 1

    # The v1 anchor must come from the full-distribution row at the SAME
    # step budget (and method) as the fit rows (shapley_pipeline.py matches
    # training_steps == v1_steps); a DB holding full-model rows at several
    # budgets would otherwise hand back whichever was appended last and
    # shift the whole curve. Budget from argv[3] or the fit rows themselves.
    v1_steps = int(sys.argv[3]) if len(sys.argv) > 3 else None
    if v1_steps is None:
        fit_steps = [rec.get("training_steps") for rec in filter_records(
            db, {"dataset": dataset, "removal_dist": "shapley_paired",
                 "method": method})
            if rec.get("training_steps")]
        v1_steps = max(set(fit_steps), key=fit_steps.count) if fit_steps else None

    x_fit, y_fit = rows_to_xy(db, dataset, "shapley_paired", 100, 100 + 10_000,
                              n_units, labels, behavior, method=method,
                              steps=v1_steps)
    # Test rows are always ground-truth retrains (the method comparison's
    # fixed side); their budget may differ from the fit rows'.
    x_test, y_test = rows_to_xy(db, dataset, "datamodel", 5000, 5000 + 10_000,
                                n_units, labels, behavior, method="retrain")

    v1 = v0 = None
    for rec in filter_records(db, {"dataset": dataset, "removal_dist": "full",
                                   "method": method}):
        if rec.get(behavior) is None:
            continue
        if rec.get("training_steps") == 0:
            v0 = float(rec[behavior])
        elif v1_steps is None or rec.get("training_steps") == v1_steps:
            v1 = float(rec[behavior])
    if v1 is None or v0 is None:
        print("WARNING: anchors missing (run still in flight?); y-range fallback")
        v1, v0 = float(y_fit.max()), float(y_fit.min())
    print(f"# fit rows {len(x_fit)}, test rows {len(x_test)}, v1={v1}, v0={v0}")

    # The reference evaluates on 100 subsets x 3 independent seed groups
    # (shapley_lds.py:69,158-166) and reports mean +- CI across groups;
    # split the 300 consecutive test seeds into 3 blocks of 100 the same way.
    n_grp = 3 if len(x_test) >= 3 else 1
    b = len(x_test) // n_grp
    groups = [(x_test[i * b:(i + 1) * b], y_test[i * b:(i + 1) * b])
              for i in range(n_grp)]

    out = {"dataset": dataset, "behavior": behavior, "method": method,
           "fit_training_steps": v1_steps, "v1": v1, "v0": v0,
           "num_test": int(len(x_test)), "test_groups": n_grp, "curve": []}
    for n in (32, 64, 128, 250, 374, len(x_fit)):
        n = min(n, len(x_fit))
        attrs = data_shapley(n_units, x_fit[:n], y_fit[:n], v1, v0).ravel()
        mean, ci = evaluate_lds(attrs, groups)
        out["curve"].append({"fit": int(n), "lds": round(mean, 2),
                             "ci": round(ci, 2)})
        print(f"fit={n:4d}  LDS = {mean:6.2f} +- {ci:.2f}")
        if n == len(x_fit):
            break

    suffix = "" if method == "retrain" else f"_{method}"
    path = f"docs/refscale_prefix_curve{suffix}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"-> {path}")


if __name__ == "__main__":
    main()
