"""Per-group score-distribution report (which artists score highest?).

CLI counterpart of the reference's dataset-distribution notebook
(text_to_image/notebooks/artbench_distribution.ipynb): it loads per-image
aesthetic scores plus an artist->image-indices dict and boxplots the
per-artist distributions ordered by median.  Here the grouping comes from
either a filenames CSV (``data.groups.artist_from_filename``, the ArtBench
convention) or a dataset's labels, and the output is the ordered per-group
statistics table (count / mean / quartiles) the boxplot renders, as text and
optional JSON.

Usage:
    python -m group_attribution_for_diffusion_models_tpu.cli.group_distribution \
        --scores image_aesthetic_score.npy \
        --filenames_csv post_impressionism_filenames.csv
"""

from __future__ import annotations

import argparse
import json

import numpy as np

from ..data.groups import artist_from_filename, load_group_table


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--scores", type=str, required=True,
                        help=".npy of one score per image")
    parser.add_argument("--filenames_csv", type=str, default=None,
                        help="per-image filename table; group = artist prefix")
    parser.add_argument("--dataset", type=str, default=None,
                        help="group by this dataset's labels instead")
    parser.add_argument("--top", type=int, default=10,
                        help="print the top/bottom N groups by median")
    parser.add_argument("--out", type=str, default=None,
                        help="also write the full table as JSON here")
    return parser.parse_args(argv)


def group_stats(scores: np.ndarray, group_of: list) -> list:
    """Per-group stats dicts ordered by median, descending (notebook cell 4)."""
    indices = {}
    for i, g in enumerate(group_of):
        indices.setdefault(str(g), []).append(i)
    rows = []
    for g, idx in indices.items():
        v = scores[np.asarray(idx)]
        rows.append({
            "group": g,
            "count": len(idx),
            "median": float(np.median(v)),
            "mean": float(np.mean(v)),
            "q25": float(np.quantile(v, 0.25)),
            "q75": float(np.quantile(v, 0.75)),
            "min": float(v.min()),
            "max": float(v.max()),
        })
    rows.sort(key=lambda r: -r["median"])
    return rows


def main(argv=None):
    args = parse_args(argv)
    scores = np.load(args.scores).ravel()

    if args.filenames_csv:
        files = load_group_table(args.filenames_csv)
        group_of = [artist_from_filename(f) for f in files]
    elif args.dataset:
        from ..data import create_dataset

        group_of = create_dataset(args.dataset, train=True).labels.tolist()
    else:
        raise SystemExit("need --filenames_csv or --dataset for the grouping")
    if len(group_of) != len(scores):
        raise SystemExit(
            f"{len(scores)} scores but {len(group_of)} grouped images"
        )

    rows = group_stats(scores, group_of)
    print(f"{len(rows)} groups over {len(scores)} images "
          f"(overall median {np.median(scores):.4f})")
    shown = rows if len(rows) <= 2 * args.top else (
        rows[:args.top] + [None] + rows[-args.top:])
    for r in shown:
        if r is None:
            print(f"  ... {len(rows) - 2 * args.top} more ...")
            continue
        print(f"  {r['group']}: median={r['median']:.4f} mean={r['mean']:.4f} "
              f"[q25={r['q25']:.4f}, q75={r['q75']:.4f}] n={r['count']}")

    if args.out:
        with open(args.out, "w") as f:
            json.dump(rows, f, indent=2)
    return rows


if __name__ == "__main__":
    main()
