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
    parser.add_argument("--method", type=str, default="retrain",
                        help="trainer for the FIT subsets and the v1/v0 "
                             "anchors (train_ensemble --method). The paper's "
                             "central comparison fits sparse fine-tuning "
                             "(prune_fine_tune + --load) against the same "
                             "retrained datamodel TEST rows — test subsets "
                             "are always ground-truth retrains (reference "
                             "shapley_lds.py:228-283 fits baseline vs "
                             "method side by side)")
    parser.add_argument("--load", type=str, default=None,
                        help="shared start checkpoint for the fit-subset "
                             "trainer (the pruned base for sparse-FT; "
                             "train_ensemble --load)")
    parser.add_argument("--fit_training_steps", type=int, default=None,
                        help="step budget for the FIT subsets when it "
                             "differs from --training_steps (the "
                             "reference's sparse-gd fine-tunes 200 steps "
                             "vs the full retrain budget, ddpm_config.py:"
                             "656-672; test subsets keep --training_steps)")
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


def _train_chunked(args, dist, seed_start, num, db, method="retrain",
                   load=None, steps=None):
    from . import train_ensemble

    for start in range(seed_start, seed_start + num, args.chunk_size):
        n = min(args.chunk_size, seed_start + num - start)
        argv = [
            "--dataset", args.dataset, "--removal_dist", dist,
            "--method", method,
            "--seed_start", str(start), "--num_seeds", str(n),
            "--outdir", args.outdir, "--db", db,
            "--n_samples",
            str(args.n_samples if args.behavior in ("fid_value", "is") else 0),
            "--num_inference_steps", str(args.num_inference_steps),
            "--log_freq", str(args.log_freq),
        ]
        if load:
            argv += ["--load", load]
        if args.behavior == "eval_loss":
            argv += ["--eval_loss", "--eval_t_min", str(args.eval_t_min)]
            if args.eval_t_max:
                argv += ["--eval_t_max", str(args.eval_t_max)]
        if args.behavior in ("fid_value", "is"):
            # In-loop sampling + Inception scoring per member — the
            # reference's per-subset inference/behaviors cost paid inside
            # the pipeline. Ref stats cache is shared across chunks.
            argv += ["--score", {"fid_value": "fid", "is": "is"}[args.behavior],
                     "--ref_stats",
                     os.path.join(args.outdir, "inception_ref_stats.pkl")]
            if args.inception_weights:
                argv += ["--inception_weights", args.inception_weights]
        if steps is not None:
            argv += ["--training_steps", str(steps)]
        elif args.training_steps:
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
    from .common import config_for as _config_for

    fit_steps = (
        args.fit_training_steps
        if args.fit_training_steps is not None
        else args.training_steps
        if args.training_steps is not None
        else _config_for(args.dataset).train.training_steps.get(args.method, 1000)
    )
    # Fit subsets train under --method (e.g. prune_fine_tune from --load);
    # test subsets are ALWAYS ground-truth retrains — that asymmetry is the
    # point of the method comparison.
    _train_chunked(args, args.fit_dist, args.removal_seed, args.num_fit_subsets,
                   db, method=args.method, load=args.load, steps=fit_steps)
    _train_chunked(args, "datamodel", args.test_seed_start, args.num_test_subsets, db)

    # Efficiency-constraint anchors: v1/v0 are the behaviors of the
    # full-data model and the null model (reference y_full/y_null,
    # shapley_lds.py:190-209). Anchoring on y.max()/y.min() instead flips
    # the constraint's sign whenever the behavior DECREASES with more data
    # (any loss-like behavior) and wrecks the fit. The anchors belong to
    # the FIT game: under --method prune_fine_tune the null model (0 steps)
    # is the loaded pruned base untouched — v(empty set) of the sparse-FT
    # game — and v1 is the base fine-tuned on all data for fit_steps.
    v1_steps = fit_steps

    def _anchor(steps):
        from . import train_ensemble

        argv = [
            "--dataset", args.dataset, "--removal_dist", "full",
            "--method", args.method,
            "--num_seeds", "1", "--outdir", args.outdir, "--db", db,
            "--training_steps", str(steps),
            "--n_samples",
            str(args.n_samples if args.behavior in ("fid_value", "is") else 0),
            "--num_inference_steps", str(args.num_inference_steps),
            "--log_freq", str(args.log_freq),
        ]
        if args.load:
            argv += ["--load", args.load]
        if args.behavior == "eval_loss":
            argv += ["--eval_loss", "--eval_t_min", str(args.eval_t_min)]
            if args.eval_t_max:
                argv += ["--eval_t_max", str(args.eval_t_max)]
        if args.behavior in ("fid_value", "is"):
            argv += ["--score", {"fid_value": "fid", "is": "is"}[args.behavior],
                     "--ref_stats",
                     os.path.join(args.outdir, "inception_ref_stats.pkl")]
            if args.inception_weights:
                argv += ["--inception_weights", args.inception_weights]
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

    def rows_to_xy(dist, seed_lo, seed_hi, method, steps):
        # Method + step-budget are part of the row identity: a DB holding
        # both retrain and sparse-FT rows for the same (dist, seed) — the
        # method-comparison workflow — must not mix them in one fit. Rows
        # come back sorted by seed so the 3-group test split below is
        # deterministic regardless of append/resume order.
        rows = filter_records(
            db, {"dataset": args.dataset, "removal_dist": dist,
                 "method": method})
        keyed = []
        for rec in rows:
            if args.behavior not in rec or rec[args.behavior] is None:
                continue
            seed = rec.get("removal_seed")
            if seed is None or not (seed_lo <= int(seed) < seed_hi):
                continue
            if rec.get("training_steps", steps) != steps:
                continue
            remaining = np.asarray(rec["remaining_idx"], np.int64)
            m = np.zeros(n_units, np.float32)
            if args.by_class:
                m[np.unique(labels[remaining])] = 1.0
            else:
                m[remaining] = 1.0
            keyed.append((int(seed), m, float(rec[args.behavior])))
        keyed.sort(key=lambda t: t[0])
        return (np.stack([m for _, m, _ in keyed]),
                np.asarray([y for _, _, y in keyed])) if keyed else (
            np.zeros((0, n_units)), np.zeros(0))

    test_steps = (
        args.training_steps if args.training_steps is not None
        else _config_for(args.dataset).train.training_steps.get("retrain", 1000)
    )
    x_fit, y_fit = rows_to_xy(args.fit_dist, fit_lo, fit_hi, args.method,
                              fit_steps)
    x_test, y_test = rows_to_xy("datamodel", test_lo, test_hi, "retrain",
                                test_steps)
    if len(x_fit) < 2 or len(x_test) < 2:
        raise SystemExit(
            f"not enough scored rows (fit {len(x_fit)}, test {len(x_test)})"
        )

    # 4) closed-form Shapley + LDS, anchored on the measured v1/v0.
    v1 = v0 = None
    for rec in filter_records(db, {"dataset": args.dataset,
                                   "removal_dist": "full",
                                   "method": args.method}):
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
    # Headline CI follows the reference protocol: split the (seed-sorted)
    # test subsets into 3 independent seed groups and report mean +-
    # 1.96*SE across groups (shapley_lds.py:138-150, 3 DBs of 100). A
    # single pooled evaluation has SE-of-one-value = 0, which misstates
    # the uncertainty (VERDICT r4 weak #3); the pooled number is kept as
    # lds_pooled.
    # 3 groups only when each holds >=10 rows — Spearman over a handful of
    # points is degenerate (2 rows always give rho = +-1), so smoke-scale
    # runs keep the single pooled group.
    n_grp = 3 if len(x_test) >= 30 else 1
    b = len(x_test) // n_grp
    groups = [(x_test[i * b:(i + 1) * b], y_test[i * b:(i + 1) * b])
              for i in range(n_grp)]
    lds_mean, lds_ci = evaluate_lds(attrs, groups)
    lds_pooled, _ = evaluate_lds(attrs, [(x_test, y_test)])
    total_time = time.time() - t0

    summary = {
        "exp_name": args.exp_name or "shapley_pipeline",
        "dataset": args.dataset,
        "method": args.method,
        "num_fit_subsets": int(len(x_fit)),
        "num_test_subsets": int(len(x_test)),
        "behavior": args.behavior,
        "fit_training_steps": int(fit_steps),
        "v1": v1,
        "v0": v0,
        "lds_mean": lds_mean,
        "lds_ci": lds_ci,
        "test_groups": n_grp,
        "lds_pooled": lds_pooled,
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
