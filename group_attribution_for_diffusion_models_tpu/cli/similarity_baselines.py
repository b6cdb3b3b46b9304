"""Retraining-free similarity baselines: pixel / CLIP-embedding / aesthetic.

CLI mirror of reference text_to_image/{baselines,pixel_similarity,
clip_similarity,aesthetic_score}.py: compute similarity matrices between
generated images and training images (raw-pixel cosine, embedding cosine),
or per-training-image aesthetic scores, aggregate per artist group
(max/avg over generations, then sum/mean/max per group), and save the
attribution vectors + rankings.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..attributions.methods.similarity import (
    aggregate_by_class,
    embedding_similarity_scores,
    pixel_distance_scores,
)
from ..data import create_dataset
from ..models.clip_vision import AestheticHead, load_clip_vision, make_embed_fn


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, required=True)
    parser.add_argument("--baseline", type=str, default="pixel",
                        choices=["pixel", "clip", "aesthetic"])
    parser.add_argument("--generated_dir", type=str, default=None,
                        help="dir of generated images (pixel/clip need it)")
    parser.add_argument("--by", type=str, default="max", choices=["max", "avg"])
    parser.add_argument("--agg", type=str, default="mean",
                        choices=["sum", "mean", "max"])
    parser.add_argument("--clip_weights", type=str, default=None)
    parser.add_argument("--aesthetic_weights", type=str, default=None)
    parser.add_argument("--max_examples", type=int, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    return parser.parse_args(argv)


def _load_dir(path):
    from PIL import Image

    files = sorted(f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg")))
    return np.stack([
        np.asarray(Image.open(os.path.join(path, f)).convert("RGB"), np.float32) / 255.0
        for f in files
    ])


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    train = create_dataset(args.dataset, train=True)
    train_imgs = train.images / 2.0 + 0.5
    labels = train.labels
    if args.max_examples:
        train_imgs, labels = train_imgs[: args.max_examples], labels[: args.max_examples]

    if args.baseline == "aesthetic":
        vis, vis_vars = load_clip_vision(
            args.clip_weights, tiny=args.dataset.startswith("synthetic")
        )
        emb = make_embed_fn(vis, vis_vars)(train_imgs[..., :3])
        from ..models.clip_vision import load_aesthetic_head

        head, head_vars = load_aesthetic_head(
            args.aesthetic_weights, dim=emb.shape[1]
        )
        scores_per_train = np.asarray(head.apply(head_vars, jnp.asarray(emb)))
        groups = np.unique(labels)
        attrs = np.array([
            scores_per_train[labels == g].max() if args.by == "max"
            else scores_per_train[labels == g].mean()
            for g in groups
        ])
    else:
        if not args.generated_dir:
            raise SystemExit(f"--baseline {args.baseline} needs --generated_dir")
        gen_imgs = _load_dir(args.generated_dir)
        if args.baseline == "pixel":
            # Match channel counts for raw-pixel cosine.
            c = min(gen_imgs.shape[-1], train_imgs.shape[-1])
            scores = pixel_distance_scores(gen_imgs[..., :c], train_imgs[..., :c])
        else:
            vis, vis_vars = load_clip_vision(
                args.clip_weights, tiny=args.dataset.startswith("synthetic")
            )
            embed = make_embed_fn(vis, vis_vars)
            scores = embedding_similarity_scores(
                embed(gen_imgs[..., :3]), embed(train_imgs[..., :3])
            )
        attrs = aggregate_by_class(scores, labels, agg=args.agg, by=args.by)

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    np.save(args.save_path, attrs)
    np.save(args.save_path.replace(".npy", "") + "_ranking.npy",
            np.argsort(attrs)[::-1])
    print(f"{args.baseline}: {len(attrs)} group attributions -> {args.save_path}")


if __name__ == "__main__":
    main()
