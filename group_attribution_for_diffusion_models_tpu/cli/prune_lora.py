"""Prune LoRA rank pairs by magnitude importance.

CLI mirror of reference text_to_image/prune_lora.py:62-217: score every
(down-col, up-row) rank-1 pair, greedily remove the globally lowest until
only (1 - pruning_ratio) of LoRA params remain, and save the pruned weights
+ info.csv (param counts and achieved ratio). Heterogeneous per-projection
ranks are just leaf shapes here — no dependency-graph surgery needed.
"""

from __future__ import annotations

import argparse
import os


from ..models.lora import lora_num_params, lora_ranks, prune_lora
from .train_text_to_image_lora import _load_lora_npz, _save_lora_npz


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--lora_dir", type=str, required=True,
                        help="trained LoRA .npz")
    parser.add_argument("--pruning_ratio", type=float, default=0.5)
    parser.add_argument("--min_rank", type=int, default=1)
    parser.add_argument("--save_path", type=str, required=True)
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    tree = _load_lora_npz(args.lora_dir)
    n_before = lora_num_params(tree)
    pruned = prune_lora(tree, args.pruning_ratio, args.min_rank)
    n_after = lora_num_params(pruned)
    _save_lora_npz(args.save_path, pruned)

    info_path = os.path.join(
        os.path.dirname(os.path.abspath(args.save_path)), "info.csv"
    )
    with open(info_path, "w") as f:
        f.write("params_before,params_after,actual_ratio,requested_ratio\n")
        f.write(f"{n_before},{n_after},{1 - n_after / n_before:.4f},{args.pruning_ratio}\n")
    ranks = lora_ranks(pruned)
    print(
        f"pruned LoRA: {n_before:,} -> {n_after:,} params "
        f"(removed {1 - n_after / n_before:.1%}); ranks "
        f"min={min(ranks.values())} max={max(ranks.values())} -> {args.save_path}"
    )


if __name__ == "__main__":
    main()
