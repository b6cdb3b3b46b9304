"""Compute global model behaviors (IS, FID, precision/recall) for a model.

CLI mirror of reference unconditional_generation/calculate_global_scores.py
:160-482: regenerate samples from a checkpoint (or read a sample dir), run
the InceptionV3 tower once for both FID features and IS logits, compare
against reference-set statistics (cached stats.pkl-style), and append the
JSONL row with remaining_idx/removed_idx so the LDS tier can rebuild masks.

Without pretrained Inception weights (zero-egress image) the tower runs
random-init: scores are self-consistent for pipeline tests but not
comparable to the reference — pass --inception_weights for converted
pytorch_fid weights.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..attributions.global_scores import (

    calculate_fid_from_features,
    compute_feature_stats,
    compute_precision_recall,
    inception_score_from_logits,
    load_inception,
    load_stats,
    make_feature_fn,
    save_stats,
)
from ..data import create_dataset
from ..diffusion.sampling import make_sampler
from ..models import UNet2D
from ..training import TrainState, make_optimizer
from ..utils import append_record
from ..utils.ckpt import load_checkpoint, load_unet_spec
from .common import add_common_args, config_for, provenance_row, vq_decode_fn_for


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--load", type=str, default=None, help="model dir")
    parser.add_argument("--sample_dir", type=str, default=None,
                        help="precomputed sample dir instead of a model")
    parser.add_argument("--n_samples", type=int, default=1024)
    parser.add_argument("--batch_size", type=int, default=256)
    parser.add_argument("--inception_weights", type=str, default=None)
    parser.add_argument("--ref_stats", type=str, default=None,
                        help="cached reference stats .pkl (computed if absent)")
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--skip_pr", action="store_true", default=False)
    parser.add_argument("--pr_extractor", type=str, default="inception",
                        choices=["inception", "vgg16"],
                        help="P&R feature tower; 'vgg16' matches the "
                             "reference's StyleGAN2 VGG16 features "
                             "(reference precision_recall.py:31-51)")
    parser.add_argument("--vgg16_weights", type=str, default=None,
                        help="torchvision-style vgg16 state dict for "
                             "--pr_extractor vgg16")
    parser.add_argument("--pr_vgg_tiny", action="store_true", default=False,
                        help="narrow VGG tower for smoke tests")
    parser.add_argument("--per_class", action="store_true", default=False,
                        help="average FID over class subdirs of --sample_dir")
    return parser.parse_args(argv)


def _load_sample_dir(path: str) -> np.ndarray:
    from PIL import Image

    files = sorted(
        f for f in os.listdir(path) if f.lower().endswith((".png", ".jpg"))
    )
    imgs = []
    for f in files:
        with Image.open(os.path.join(path, f)) as im:
            imgs.append(np.asarray(im.convert("RGB"), np.float32) / 255.0)
    return np.stack(imgs)


def _per_class_fid(
    sample_dir: str, extract, ref_by_class, batch_size: int
) -> float:
    """Average FID over class subdirectories (reference
    calculate_global_scores.py:405-473): sample_dir/<class>/ vs the
    reference images of that class."""
    fids = []
    for cls in sorted(os.listdir(sample_dir)):
        cls_dir = os.path.join(sample_dir, cls)
        if not os.path.isdir(cls_dir) or cls not in ref_by_class:
            continue
        gen_feats, _ = extract(_load_sample_dir(cls_dir))
        ref_feats, _ = extract(ref_by_class[cls])
        fids.append(calculate_fid_from_features(gen_feats, ref_features=ref_feats))
    if not fids:
        raise SystemExit(f"no class subdirectories found under {sample_dir}")
    return float(np.mean(fids))


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)

    if args.per_class:
        if not args.sample_dir:
            raise SystemExit("--per_class needs --sample_dir with class subdirs")
        ref = create_dataset(args.dataset, train=True)
        ref_imgs = ref.images / 2.0 + 0.5
        if ref_imgs.shape[-1] == 1:
            ref_imgs = np.repeat(ref_imgs, 3, axis=-1)
        ref_by_class = {
            str(c): ref_imgs[ref.labels == c] for c in np.unique(ref.labels)
        }
        model_inc, variables = load_inception(args.inception_weights)
        extract = make_feature_fn(model_inc, variables, batch_size=args.batch_size)
        t0 = time.time()
        fid_value = _per_class_fid(
            args.sample_dir, extract, ref_by_class, args.batch_size
        )
        row = provenance_row(args, fid_value=fid_value,
                             scoring_time=time.time() - t0)
        db = args.db or os.path.join(args.outdir, f"{args.dataset}_global_db.jsonl")
        append_record(db, row)
        print(f"per-class avg fid={fid_value:.3f} -> {db}")
        return

    t0 = time.time()
    if args.sample_dir:
        samples = _load_sample_dir(args.sample_dir)
        remaining_idx, removed_idx = [], []
    elif args.load:
        spec = cfg.unet
        model = UNet2D(spec)
        x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
        params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))["params"]
        state, meta = load_checkpoint(
            args.load, TrainState.create(params, make_optimizer("adam", lr=1e-4))
        )
        loaded_spec = load_unet_spec(meta)
        if loaded_spec is not None and loaded_spec != spec:
            model = UNet2D(loaded_spec)
        remaining_idx = meta.get("remaining_idx", [])
        removed_idx = meta.get("removed_idx", [])
        batch = min(args.batch_size, args.n_samples)
        sampler = make_sampler(
            model.apply, cfg.scheduler,
            (batch, spec.sample_size, spec.sample_size, spec.in_channels),
            num_inference_steps=args.num_inference_steps, kind="ddim",
            decode_fn=vq_decode_fn_for(cfg, args.vqvae_weights),
        )
        chunks = []
        for b in range(-(-args.n_samples // batch)):
            key = jax.random.fold_in(jax.random.PRNGKey(args.seed), b)
            chunks.append(np.asarray(sampler(state.ema_params, key)))
        samples = np.concatenate(chunks)[: args.n_samples]
    else:
        raise SystemExit("need --load or --sample_dir")
    sampling_time = time.time() - t0

    if samples.shape[-1] == 1:
        samples = np.repeat(samples, 3, axis=-1)

    model_inc, variables = load_inception(args.inception_weights)
    extract = make_feature_fn(model_inc, variables, batch_size=args.batch_size)

    t0 = time.time()
    gen_feats, gen_logits = extract(samples)

    # Reference features / stats.
    ref_feats = None
    if args.ref_stats and os.path.exists(args.ref_stats):
        ref_stats = load_stats(args.ref_stats)
    else:
        ref = create_dataset(args.dataset, train=True)
        ref_imgs = ref.images[: max(args.n_samples, 2048)] / 2.0 + 0.5
        if ref_imgs.shape[-1] == 1:
            ref_imgs = np.repeat(ref_imgs, 3, axis=-1)
        ref_feats, _ = extract(ref_imgs)
        ref_stats = compute_feature_stats(ref_feats)
        if args.ref_stats:
            save_stats(args.ref_stats, *ref_stats)

    fid_value = calculate_fid_from_features(gen_feats, ref_stats=ref_stats)
    is_mean, is_std = inception_score_from_logits(gen_logits)
    if args.skip_pr or (ref_feats is None and args.pr_extractor == "inception"):
        precision = recall = None
    elif args.pr_extractor == "vgg16":
        # Reference parity: P&R on VGG16 fc2 features (reference
        # precision_recall.py:31-51), separate from the FID/IS tower.
        from ..attributions.global_scores.vgg16 import (
            load_vgg16,
            make_vgg_feature_fn,
        )

        vgg, vgg_vars = load_vgg16(args.vgg16_weights, tiny=args.pr_vgg_tiny)
        vgg_extract = make_vgg_feature_fn(vgg, vgg_vars,
                                          batch_size=args.batch_size)
        ref = create_dataset(args.dataset, train=True)
        ref_imgs = ref.images[: max(args.n_samples, 2048)] / 2.0 + 0.5
        if ref_imgs.shape[-1] == 1:
            ref_imgs = np.repeat(ref_imgs, 3, axis=-1)
        precision, recall = compute_precision_recall(
            vgg_extract(ref_imgs), vgg_extract(samples)
        )
    else:
        precision, recall = compute_precision_recall(ref_feats, gen_feats)
    scoring_time = time.time() - t0

    row = provenance_row(
        args,
        fid_value=fid_value,
        **{"is": is_mean},
        is_std=is_std,
        precision=precision,
        recall=recall,
        remaining_idx=list(remaining_idx),
        removed_idx=list(removed_idx),
        sampling_time=sampling_time,
        scoring_time=scoring_time,
    )
    db = args.db or os.path.join(args.outdir, f"{args.dataset}_global_db.jsonl")
    append_record(db, row)
    print(
        f"fid={fid_value:.3f} is={is_mean:.3f}+-{is_std:.3f} "
        f"precision={precision} recall={recall} -> {db}"
    )


if __name__ == "__main__":
    main()
