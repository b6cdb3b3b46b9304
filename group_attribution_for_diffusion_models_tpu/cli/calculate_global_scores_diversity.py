"""Demographic-diversity entropy behavior (the CelebA global score).

CLI mirror of reference unconditional_generation/
calculate_global_scores_diversity.py: embed reference + generated images,
Ward-cluster the reference embeddings into --num_clusters, assign generated
images to nearest clusters, and append the JSONL row with entropy /
cluster_count / cluster_proportions (the keys lds.py reads).

Embeddings come from (in order): --embeddings_npz (precomputed ref_emb /
gen_emb arrays, e.g. BLIP-VQA run elsewhere), or the on-device InceptionV3
pool3 tower (--inception_weights for converted weights; random-init without).
The reference hardwires BLIP-VQA (diversity_score.py:89-91); the clustering
and entropy math is extractor-agnostic, so the tower is pluggable here.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..attributions.global_scores import (
    calculate_diversity_score,
    load_inception,
    make_feature_fn,
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
    parser.add_argument("--embeddings_npz", type=str, default=None,
                        help="npz with ref_emb (and optionally gen_emb)")
    parser.add_argument("--n_samples", type=int, default=256)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--num_clusters", type=int, default=20)
    parser.add_argument("--inception_weights", type=str, default=None)
    parser.add_argument("--blip_weights", type=str, default=None,
                        help="converted BLIP vision-tower weights: use the "
                             "reference's BLIP-VQA embedding extractor "
                             "(diversity_score.py:89-91) instead of Inception")
    parser.add_argument("--blip_tiny", action="store_true", default=False,
                        help="tiny BLIP tower (smoke tests)")
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)

    gen_emb = None
    if args.embeddings_npz:
        store = np.load(args.embeddings_npz)
        ref_emb = store["ref_emb"]
        gen_emb = store.get("gen_emb")
    else:
        ref_emb = None

    remaining_idx, removed_idx = [], []
    sampling_time = 0.0
    if gen_emb is None:
        if not args.load:
            raise SystemExit("need --load (or gen_emb inside --embeddings_npz)")
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
        t0 = time.time()
        chunks = [
            np.asarray(sampler(state.ema_params, jax.random.fold_in(jax.random.PRNGKey(args.seed), b)))
            for b in range(-(-args.n_samples // batch))
        ]
        samples = np.concatenate(chunks)[: args.n_samples]
        sampling_time = time.time() - t0
        if samples.shape[-1] == 1:
            samples = np.repeat(samples, 3, axis=-1)

        # Embedding tower: BLIP-VQA (the reference's extractor) when
        # requested, InceptionV3 pool3 otherwise.
        if args.blip_weights or args.blip_tiny:
            from ..models.blip_vision import load_blip_vision

            blip, blip_vars = load_blip_vision(args.blip_weights,
                                               tiny=args.blip_tiny)

            @jax.jit
            def _embed(batch):
                return blip.apply(blip_vars, batch)

            def extract(images):
                outs = [
                    np.asarray(_embed(jnp.asarray(images[i:i + args.batch_size])))
                    for i in range(0, len(images), args.batch_size)
                ]
                return np.concatenate(outs), None
        else:
            inc, variables = load_inception(args.inception_weights)
            extract = make_feature_fn(inc, variables, batch_size=args.batch_size)
        gen_emb, _ = extract(samples)
        if ref_emb is None:
            ref = create_dataset(args.dataset, train=True)
            ref_imgs = ref.images[: 4 * args.n_samples] / 2.0 + 0.5
            if ref_imgs.shape[-1] == 1:
                ref_imgs = np.repeat(ref_imgs, 3, axis=-1)
            ref_emb, _ = extract(ref_imgs)

    out = calculate_diversity_score(ref_emb, gen_emb, args.num_clusters)
    row = provenance_row(
        args,
        entropy=out["entropy"],
        cluster_count=out["cluster_count"],
        cluster_proportions=out["cluster_proportions"],
        remaining_idx=list(remaining_idx),
        removed_idx=list(removed_idx),
        sampling_time=sampling_time,
    )
    db = args.db or os.path.join(args.outdir, f"{args.dataset}_diversity_db.jsonl")
    append_record(db, row)
    print(f"entropy={out['entropy']:.4f} clusters={args.num_clusters} -> {db}")


if __name__ == "__main__":
    main()
