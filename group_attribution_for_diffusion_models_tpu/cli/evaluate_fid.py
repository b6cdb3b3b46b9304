"""Thin path-vs-path FID (reference evaluate_fid.py:1-114).

Computes FID between two image directories (or a directory and cached
reference stats) with the Flax InceptionV3 tower, appending a JSONL row.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..attributions.global_scores import (
    calculate_fid_from_features,
    compute_feature_stats,
    load_inception,
    load_stats,
    make_feature_fn,
    save_stats,
)
from ..utils import append_record


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--generated_dir", type=str, required=True)
    parser.add_argument("--reference_dir", type=str, default=None)
    parser.add_argument("--ref_stats", type=str, default=None)
    parser.add_argument("--inception_weights", type=str, default=None)
    parser.add_argument("--batch_size", type=int, default=128)
    parser.add_argument("--db", type=str, default=None)
    return parser.parse_args(argv)


def _load_dir(path):
    from PIL import Image

    files = sorted(f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg")))
    return np.stack([
        np.asarray(Image.open(os.path.join(path, f)).convert("RGB"), np.float32) / 255.0
        for f in files
    ])


def main(argv=None):
    args = parse_args(argv)
    model, variables = load_inception(args.inception_weights)
    extract = make_feature_fn(model, variables, batch_size=args.batch_size)

    gen_feats, _ = extract(_load_dir(args.generated_dir))
    if args.ref_stats and os.path.exists(args.ref_stats):
        stats = load_stats(args.ref_stats)
    elif args.reference_dir:
        ref_feats, _ = extract(_load_dir(args.reference_dir))
        stats = compute_feature_stats(ref_feats)
        if args.ref_stats:
            save_stats(args.ref_stats, *stats)
    else:
        raise SystemExit("need --reference_dir or --ref_stats")

    fid_value = calculate_fid_from_features(gen_feats, ref_stats=stats)
    print(f"fid_value={fid_value:.4f}")
    if args.db:
        append_record(args.db, {
            "generated_dir": args.generated_dir,
            "reference_dir": args.reference_dir,
            "fid_value": fid_value,
        })


if __name__ == "__main__":
    main()
