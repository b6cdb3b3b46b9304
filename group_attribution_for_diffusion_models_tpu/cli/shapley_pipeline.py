"""End-to-end Shapley attribution in one command.

The reference spreads one attribution experiment across hundreds of SLURM
jobs and four script families (train -> score -> fit -> LDS, SURVEY.md §1).
This command runs the whole estimation loop in-process on the ensemble axis:

  1. ensemble-train the Shapley fit subsets AND the datamodel test subsets
     (one compiled program per distribution);
  2. ensemble-sample every member with the compiled DDIM sampler;
  3. score a global behavior per member (Inception FID / IS against the
     training set, or the training loss for weight-free smoke runs);
  4. fit closed-form KernelSHAP on the fit rows and report Spearman LDS
     against the retrained test rows.

Every intermediate row still lands in the JSONL DB, so the individual CLIs
interoperate with its outputs.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..attributions import evaluate_lds
from ..attributions.methods import data_shapley
from ..utils import append_record, filter_records
from .common import add_common_args


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--num_fit_subsets", type=int, default=16)
    parser.add_argument("--fit_dist", type=str, default="shapley",
                        choices=["shapley", "shapley_paired", "datamodel",
                                 "uniform", "uniform_paired"],
                        help="fit-subset sampler + estimator family: "
                             "shapley[_paired] -> closed-form KernelSHAP, "
                             "datamodel -> ridge-CV (matched to the alpha="
                             "0.5 test protocol — unbiased when the game "
                             "has size-dependent interactions), uniform"
                             "[_paired] -> Banzhaf. *_paired draws "
                             "antithetic complement pairs (Covert & Lee "
                             "paired sampling — lower estimator variance "
                             "at the same retrain budget)")
    parser.add_argument("--num_test_subsets", type=int, default=8)
    parser.add_argument("--test_seed_start", type=int, default=42)
    parser.add_argument("--training_steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--n_samples", type=int, default=16,
                        help="generated images per member for scoring")
    parser.add_argument("--behavior", type=str, default="eval_loss",
                        choices=["eval_loss", "loss", "fid_value", "is"])
    parser.add_argument("--inception_weights", type=str, default=None)
    parser.add_argument("--chunk_size", type=int, default=32,
                        help="members per ensemble invocation")
    parser.add_argument("--eval_t_min", type=int, default=0)
    parser.add_argument("--eval_t_max", type=int, default=None,
                        help="probe-timestep band for --behavior eval_loss "
                             "(see train_ensemble --eval_t_max)")
    parser.add_argument("--log_freq", type=int, default=0,
                        help="scan-chunk size in steps (keeps each device "
                             "dispatch short; 0 = whole run in one dispatch)")
    parser.add_argument(
        "--save_ckpts", action=argparse.BooleanOptionalAction, default=True,
        help="checkpoint every subset member (train_ensemble --save_ckpts). "
             "--no-save_ckpts skips the per-member device->host pulls for "
             "mass runs — the DB behavior row is the product; the full/null "
             "anchor models are always checkpointed.")
    return parser.parse_args(argv)


def _train_chunked(args, dist, seed_start, num, db):
    from . import train_ensemble

    for start in range(seed_start, seed_start + num, args.chunk_size):
        n = min(args.chunk_size, seed_start + num - start)
        argv = [
            "--dataset", args.dataset, "--removal_dist", dist,
            "--seed_start", str(start), "--num_seeds", str(n),
            "--outdir", args.outdir, "--db", db,
            "--n_samples",
            str(args.n_samples if args.behavior in ("fid_value", "is") else 0),
            "--num_inference_steps", str(args.num_inference_steps),
            "--log_freq", str(args.log_freq),
        ]
        if args.behavior == "eval_loss":
            argv += ["--eval_loss", "--eval_t_min", str(args.eval_t_min)]
            if args.eval_t_max:
                argv += ["--eval_t_max", str(args.eval_t_max)]
        if args.training_steps:
            argv += ["--training_steps", str(args.training_steps)]
        if args.batch_size:
            argv += ["--batch_size", str(args.batch_size)]
        if args.datamodel_alpha and dist.startswith("datamodel"):
            argv += ["--datamodel_alpha", str(args.datamodel_alpha)]
        if args.vqvae_weights:
            argv += ["--vqvae_weights", args.vqvae_weights]
        if args.by_class:
            argv += ["--by_class"]
        if not args.save_ckpts:
            argv += ["--no-save_ckpts"]
        train_ensemble.main(argv)


def main(argv=None):
    args = parse_args(argv)
    db = args.db or os.path.join(args.outdir, f"{args.dataset}_pipeline_db.jsonl")
    t0 = time.time()

    # 1+2) subset ensembles: shapley fit rows + datamodel test rows.
    if args.fit_dist.endswith("_paired") and (
        args.removal_seed % 2 or args.num_fit_subsets % 2
    ):
        # Pairs are (2k, 2k+1); an odd start offsets every pair and an odd
        # count leaves one draw unpaired — marginals stay correct but the
        # antithetic variance reduction (the point of *_paired) degrades.
        print(
            f"WARNING: {args.fit_dist} wants an even --removal_seed and "
            f"--num_fit_subsets to form complete antithetic pairs "
            f"(got seed={args.removal_seed}, n={args.num_fit_subsets})"
        )
    fit_lo = args.removal_seed
    fit_hi = fit_lo + args.num_fit_subsets
    test_lo = args.test_seed_start
    test_hi = test_lo + args.num_test_subsets
    if args.fit_dist == "datamodel" and fit_lo < test_hi and test_lo < fit_hi:
        raise SystemExit(
            f"--fit_dist datamodel: fit seeds [{fit_lo},{fit_hi}) overlap "
            f"test seeds [{test_lo},{test_hi}) — the same (dist, seed) rows "
            f"would appear on both sides; pick a disjoint --removal_seed"
        )
    _train_chunked(args, args.fit_dist, args.removal_seed, args.num_fit_subsets, db)
    _train_chunked(args, "datamodel", args.test_seed_start, args.num_test_subsets, db)

    # Efficiency-constraint anchors: v1/v0 are the behaviors of the
    # full-data model and the untrained null model (reference y_full/y_null,
    # shapley_lds.py:190-209). Anchoring on y.max()/y.min() instead flips
    # the constraint's sign whenever the behavior DECREASES with more data
    # (any loss-like behavior) and wrecks the fit.
    from .common import config_for

    cfg = config_for(args.dataset)
    v1_steps = args.training_steps or cfg.train.training_steps.get("retrain", 1000)

    def _anchor(steps):
        from . import train_ensemble

        argv = [
            "--dataset", args.dataset, "--removal_dist", "full",
            "--num_seeds", "1", "--outdir", args.outdir, "--db", db,
            "--training_steps", str(steps),
            "--n_samples",
            str(args.n_samples if args.behavior in ("fid_value", "is") else 0),
            "--num_inference_steps", str(args.num_inference_steps),
            "--log_freq", str(args.log_freq),
        ]
        if args.behavior == "eval_loss":
            argv += ["--eval_loss", "--eval_t_min", str(args.eval_t_min)]
            if args.eval_t_max:
                argv += ["--eval_t_max", str(args.eval_t_max)]
        if args.batch_size:
            argv += ["--batch_size", str(args.batch_size)]
        if args.vqvae_weights:
            argv += ["--vqvae_weights", args.vqvae_weights]
        train_ensemble.main(argv)

    _anchor(0)        # null model (must run before the trained full model
    _anchor(v1_steps)  # claims the 'full' leaf's final checkpoint)
    train_time = time.time() - t0

    # 3) collect (mask, behavior) rows. With --by_class the attribution units
    # are classes, so image-level remaining_idx collapses to a class mask
    # (cli.lds does the same, mirroring reference lds.py:223-229) — fitting
    # n_classes coefficients instead of n_images makes the closed form
    # well-posed at realistic fit-subset counts.
    from ..data import create_dataset

    dataset = create_dataset(args.dataset, train=True)
    if args.by_class:
        labels = dataset.labels
        n_units = int(labels.max()) + 1
    else:
        n_units = len(dataset)

    def rows_to_xy(dist, seed_lo, seed_hi):
        rows = filter_records(db, {"dataset": args.dataset, "removal_dist": dist})
        masks, ys = [], []
        for rec in rows:
            if args.behavior not in rec or rec[args.behavior] is None:
                continue
            seed = rec.get("removal_seed")
            if seed is None or not (seed_lo <= int(seed) < seed_hi):
                continue
            remaining = np.asarray(rec["remaining_idx"], np.int64)
            m = np.zeros(n_units, np.float32)
            if args.by_class:
                m[np.unique(labels[remaining])] = 1.0
            else:
                m[remaining] = 1.0
            masks.append(m)
            ys.append(float(rec[args.behavior]))
        return (np.stack(masks), np.asarray(ys)) if masks else (
            np.zeros((0, n_units)), np.zeros(0))

    x_fit, y_fit = rows_to_xy(args.fit_dist, fit_lo, fit_hi)
    x_test, y_test = rows_to_xy("datamodel", test_lo, test_hi)
    if len(x_fit) < 2 or len(x_test) < 2:
        raise SystemExit(
            f"not enough scored rows (fit {len(x_fit)}, test {len(x_test)})"
        )

    # 4) closed-form Shapley + LDS, anchored on the measured v1/v0.
    v1 = v0 = None
    for rec in filter_records(db, {"dataset": args.dataset,
                                   "removal_dist": "full"}):
        if rec.get(args.behavior) is None:
            continue
        if rec.get("training_steps") == 0:
            v0 = float(rec[args.behavior])
        elif rec.get("training_steps") == v1_steps:
            v1 = float(rec[args.behavior])
    if v1 is None or v0 is None:
        print("WARNING: missing full/null anchor rows; "
              "falling back to y-range anchors")
        v1, v0 = float(y_fit.max()), float(y_fit.min())
    if args.fit_dist in ("shapley", "shapley_paired"):
        attrs = data_shapley(n_units, x_fit, y_fit, v1, v0).ravel()
    else:
        # Matched-distribution estimators (fit dispatch mirrors cli.lds /
        # reference lds.py:411-445): datamodel -> ridge-CV, uniform ->
        # Banzhaf. No efficiency constraint — unbiased for the alpha=0.5
        # LDS protocol even when the game has size-dependent interactions
        # (see ROADMAP "size-interaction finding").
        from .lds import fit_attribution

        attrs = fit_attribution(
            args.fit_dist, x_fit, y_fit, n_units, v1=v1, v0=v0
        ).ravel()
    lds_mean, lds_ci = evaluate_lds(attrs, [(x_test, y_test)])
    total_time = time.time() - t0

    summary = {
        "exp_name": args.exp_name or "shapley_pipeline",
        "dataset": args.dataset,
        "num_fit_subsets": int(len(x_fit)),
        "num_test_subsets": int(len(x_test)),
        "behavior": args.behavior,
        "v1": v1,
        "v0": v0,
        "lds_mean": lds_mean,
        "lds_ci": lds_ci,
        "train_time_s": round(train_time, 1),
        "total_time_s": round(total_time, 1),
        "subset_passes_per_hour": round(
            (len(x_fit) + len(x_test)) / (train_time / 3600.0), 1
        ),
    }
    append_record(db, summary)
    np.save(os.path.join(args.outdir, "shapley_pipeline_attrs.npy"), attrs)
    print(
        f"LDS = {lds_mean:.2f} +- {lds_ci:.2f} over {len(x_test)} test subsets "
        f"({len(x_fit)} fit subsets, {summary['subset_passes_per_hour']}/h) "
        f"in {total_time:.1f}s -> {db}"
    )


if __name__ == "__main__":
    main()
