"""Ground-truth Shapley convergence: exact values from exhaustive retrains.

Reference counterpart: text_to_image/notebooks/empirical_verification.ipynb
cell 4 ("Shapley-attribution Pearson vs ground truth": CIFAR 0.763->0.953,
CelebA 0.553->0.829 as fit subsets grow) and shapley_convergence.py, which
both measure the estimator against a LARGE-K pseudo-truth because exhaustive
retraining is out of reach for a SLURM array.

On the ensemble axis the exact game is computable at demo scale: every one
of the 2^C - 1 non-empty class subsets retrains as an ensemble member
(v(empty set) is the untrained-model anchor, the same v0 convention as
shapley_pipeline), exact Shapley values follow by full enumeration
(attributions.methods.brute_force_shapley over the measured value table),
and KernelSHAP estimates at increasing fit-subset counts are scored against
them by LOOKUP into the same enumerated game — the estimate sweep costs no
extra training.

Usage (smoke, CPU):
    python -m group_attribution_for_diffusion_models_tpu.cli.shapley_groundtruth \
        --dataset synthetic_64x8_c4_tpl_mix --training_steps 4 --outdir /tmp/gt

Demo scale (one v5e chip, ~1 h):
    ... --dataset synthetic_1024x32_c8_tpl_mix_big --training_steps 400 \
        --chunk_size 32 --eval_t_min 100 --eval_t_max 600
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np

from ..attributions.methods import brute_force_shapley, data_shapley
from ..data import create_dataset, sample_removal
from ..utils import append_record, filter_records
from .common import add_common_args


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--training_steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--chunk_size", type=int, default=32,
                        help="members per ensemble invocation")
    parser.add_argument("--eval_t_min", type=int, default=0)
    parser.add_argument("--eval_t_max", type=int, default=None)
    parser.add_argument("--log_freq", type=int, default=0,
                        help="scan-chunk size in steps (0 = one dispatch)")
    parser.add_argument("--fit_counts", type=str, default="10,24,50,100,200",
                        help="KernelSHAP fit-subset counts for the "
                             "convergence curve (even counts keep "
                             "shapley_paired's antithetic pairs complete)")
    parser.add_argument("--num_estimate_seeds", type=int, default=3,
                        help="independent estimate draws averaged per count")
    parser.add_argument("--estimate_dists", type=str,
                        default="shapley,shapley_paired",
                        help="fit-subset samplers to compare against the "
                             "exact game (paired = antithetic complements)")
    return parser.parse_args(argv)


def _train_enum(args, masks_path, num_masks, db):
    from . import train_ensemble

    for start in range(0, num_masks, args.chunk_size):
        n = min(args.chunk_size, num_masks - start)
        argv = [
            "--dataset", args.dataset, "--removal_dist", "enum",
            "--removal_masks", masks_path, "--by_class",
            "--seed_start", str(start), "--num_seeds", str(n),
            "--outdir", args.outdir, "--db", db, "--n_samples", "0",
            "--eval_loss", "--eval_t_min", str(args.eval_t_min),
            "--log_freq", str(args.log_freq),
            # Only the behavior rows feed the exact game; skipping the
            # per-member checkpoint pulls removes the dominant wall-clock
            # cost of the 2^C-1 enumeration on a remote-relay backend
            # (resume falls back to DB rows).
            "--no-save_ckpts",
        ]
        if args.eval_t_max:
            argv += ["--eval_t_max", str(args.eval_t_max)]
        if args.training_steps is not None:
            argv += ["--training_steps", str(args.training_steps)]
        if args.batch_size:
            argv += ["--batch_size", str(args.batch_size)]
        if args.vqvae_weights:
            argv += ["--vqvae_weights", args.vqvae_weights]
        train_ensemble.main(argv)


def main(argv=None):
    args = parse_args(argv)
    os.makedirs(args.outdir, exist_ok=True)
    db = args.db or os.path.join(
        args.outdir, f"{args.dataset}_groundtruth_db.jsonl"
    )
    t0 = time.time()

    # Resolve the effective retrain budget up front: rows are filtered on it
    # below, so a re-run into a reused outdir with different --training_steps
    # (or eval band) fails loudly instead of silently mixing stale rows
    # (train_ensemble's checkpoint idempotence would skip the retrains).
    from .common import config_for

    if args.training_steps is None:
        cfg = config_for(args.dataset)
        args.training_steps = cfg.train.training_steps.get("retrain", 1000)

    dataset = create_dataset(args.dataset, train=True)
    labels = dataset.labels
    n_classes = int(labels.max()) + 1
    if n_classes > 12:
        raise SystemExit(
            f"{n_classes} classes -> {2**n_classes - 1} subsets; cap the "
            "class count (e.g. a synthetic_*_c8_* dataset) to keep "
            "exhaustive enumeration feasible"
        )

    # Non-empty class subsets; mask row s encodes the integer s+1.
    num_masks = 2**n_classes - 1
    masks = np.array(
        [[(m >> k) & 1 for k in range(n_classes)]
         for m in range(1, num_masks + 1)],
        dtype=np.int8,
    )
    masks_path = os.path.join(args.outdir, "enum_masks.npy")
    np.save(masks_path, masks)

    # 1) retrain every subset; 2) the untrained null anchor (v of empty set).
    _train_enum(args, masks_path, num_masks, db)
    from . import train_ensemble

    null_argv = [
        "--dataset", args.dataset, "--removal_dist", "full",
        "--num_seeds", "1", "--outdir", args.outdir, "--db", db,
        "--training_steps", "0", "--n_samples", "0",
        "--eval_loss", "--eval_t_min", str(args.eval_t_min),
        "--no-save_ckpts",
    ]
    if args.eval_t_max:
        null_argv += ["--eval_t_max", str(args.eval_t_max)]
    if args.vqvae_weights:
        null_argv += ["--vqvae_weights", args.vqvae_weights]
    train_ensemble.main(null_argv)
    train_time = time.time() - t0

    # 3) measured value table v[mask-int]; v[0] = untrained null model.
    v = np.full(num_masks + 1, np.nan)
    for rec in filter_records(db, {"dataset": args.dataset,
                                   "removal_dist": "enum"}):
        if rec.get("eval_loss") is None:
            continue
        if (rec.get("training_steps") != args.training_steps
                or rec.get("eval_t_min") != args.eval_t_min
                or rec.get("eval_t_max") != args.eval_t_max):
            continue  # stale row from a differently-configured run
        kept = np.unique(labels[np.asarray(rec["remaining_idx"], np.int64)])
        v[int(np.sum(1 << kept))] = float(rec["eval_loss"])
    for rec in filter_records(db, {"dataset": args.dataset,
                                   "removal_dist": "full"}):
        if rec.get("training_steps") == 0 and rec.get("eval_loss") is not None:
            v[0] = float(rec["eval_loss"])
    missing = int(np.isnan(v).sum())
    if missing:
        raise SystemExit(
            f"{missing} subset values missing from {db} at "
            f"training_steps={args.training_steps} "
            f"eval_t=[{args.eval_t_min},{args.eval_t_max}); a reused outdir "
            "with different settings skips retrains on existing checkpoints "
            "— use a fresh --outdir"
        )
    v0, v1 = float(v[0]), float(v[num_masks])

    # 4) exact Shapley over the measured game.
    exact = brute_force_shapley(
        n_classes, lambda s: v[int(np.sum(1 << np.array(sorted(s), np.int64)))]
        if s else v0
    )
    # A fixed-budget game can land in a near-uniform-truth regime (measured
    # on identical data across backends: CPU c8 had ~30x the truth spread of
    # the v5e run), where estimator MSE still converges but correlation
    # against the exact vector is noise-dominated. Surface that up front.
    exact_spread = float(np.std(exact))
    rel_spread = exact_spread / max(abs(float(np.mean(exact))), 1e-12)
    if rel_spread < 0.05:
        print(
            f"WARNING: exact Shapley values are near-uniform (std "
            f"{exact_spread:.2e}, {100 * rel_spread:.1f}% of |mean|) — "
            "Pearson/Spearman vs exact are noise-dominated on this game; "
            "judge convergence by mse",
            flush=True,
        )

    # 5) KernelSHAP estimates at increasing fit counts, valued by lookup.
    def _estimate(count, seed0, dist):
        xs, ys = [], []
        for j in range(count):
            remaining, _ = sample_removal(
                dist, labels, seed=seed0 + j, by_class=True
            )
            kept = np.unique(labels[remaining])
            m = np.zeros(n_classes, np.float32)
            m[kept] = 1.0
            xs.append(m)
            ys.append(v[int(np.sum(1 << kept))])
        return data_shapley(
            n_classes, np.stack(xs), np.asarray(ys), v1, v0
        ).ravel()

    # scipy handles tied ranks correctly (data_shapley snaps tiny
    # coefficients to exactly 0, which a double-argsort Spearman would
    # rank arbitrarily).
    from scipy import stats

    curve = []
    fit_counts = [int(c) for c in args.fit_counts.split(",")]
    dists = [d.strip() for d in args.estimate_dists.split(",") if d.strip()]
    for dist in dists:
        for count in fit_counts:
            pearsons, spearmans, mses = [], [], []
            for e in range(args.num_estimate_seeds):
                # even seed0 keeps shapley_paired's (2k, 2k+1) pairs aligned
                est = _estimate(count, seed0=10_000 * (e + 1), dist=dist)
                pearsons.append(float(stats.pearsonr(est, exact)[0]))
                spearmans.append(float(stats.spearmanr(est, exact)[0]))
                mses.append(float(np.mean((est - exact) ** 2)))
            curve.append({
                "dist": dist,
                "fit_subsets": count,
                "pearson": round(float(np.mean(pearsons)), 4),
                "spearman": round(float(np.mean(spearmans)), 4),
                "mse": float(np.mean(mses)),
            })

    total_time = time.time() - t0
    summary = {
        "exp_name": args.exp_name or "shapley_groundtruth",
        "dataset": args.dataset,
        "removal_dist": "groundtruth_summary",
        # Full invocation args: the exact Shapley values of a fixed-budget
        # game are sensitive to training/eval settings (and even backend
        # arithmetic), so a summary without them is not reproducible.
        "args": {k: v for k, v in vars(args).items()},
        "n_classes": n_classes,
        "num_enumerated": num_masks,
        "v1": v1,
        "v0": v0,
        "exact_std": exact_spread,
        "exact_rel_spread": rel_spread,
        "convergence": curve,
        "train_time_s": round(train_time, 1),
        "total_time_s": round(total_time, 1),
        "subset_passes_per_hour": round(
            (num_masks + 1) / (train_time / 3600.0), 1
        ),
    }
    append_record(db, summary)
    np.save(os.path.join(args.outdir, "shapley_groundtruth_exact.npy"), exact)
    print("ground-truth convergence (exact Shapley from "
          f"{num_masks} exhaustive retrains):")
    for row in curve:
        print(f"  {row['dist']:>16s} fit={row['fit_subsets']:>4d}  "
              f"Pearson={row['pearson']:+.3f}  Spearman={row['spearman']:+.3f}  "
              f"mse={row['mse']:.3e}")
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
