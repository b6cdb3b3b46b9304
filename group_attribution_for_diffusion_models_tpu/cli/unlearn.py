"""Unlearn a removal subset from a trained model and score it, in one process.

CLI mirror of reference unconditional_generation/unlearn.py:267-971 — the
per-subset inner job of Shapley estimation. Method dispatch:

* iu / iu_u   — WoodFisher influence unlearning (lax.scan recursion)
* gd / gd_u   — fine-tune on the remaining set
* ga / ga_u   — gradient ascent on the removed set
* lora / lora_u — LoRA fine-tune on the remaining set (LoRA-only gradients)

then EMA sampling and either global scores (FID/IS/P&R — or diversity
entropy for celeba) or local paired behaviors vs the full model, appended as
one JSONL row with timings.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..data import batch_iterator, create_dataset
from ..diffusion import make_schedule
from ..diffusion.sampling import make_sampler
from ..models import UNet2D
from ..models.lora import lora_init, lora_merge
from ..training import TrainState, make_optimizer, make_train_step
from ..unlearn import influence_unlearn
from ..utils import append_record
from ..utils.ckpt import load_checkpoint, load_unet_spec
from .common import (
    add_common_args,
    config_for,
    model_output_dir,
    provenance_row,
    save_removal_indices,
    setup_removal,
)


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--method", type=str, default="gd",
                        choices=["iu", "iu_u", "gd", "gd_u", "ga", "ga_u",
                                 "lora", "lora_u"])
    parser.add_argument("--load", type=str, required=True,
                        help="model dir of the trained full model")
    parser.add_argument("--model_behavior", type=str, default="global",
                        choices=["global", "local", "none"])
    parser.add_argument("--training_steps", type=int, default=None)
    parser.add_argument("--batch_size", type=int, default=None)
    parser.add_argument("--lr", type=float, default=None)
    parser.add_argument("--iu_ratio", type=float, default=1.0)
    parser.add_argument("--wf_batches", type=int, default=16)
    parser.add_argument("--lora_rank", type=int, default=16)
    parser.add_argument("--n_samples", type=int, default=64)
    parser.add_argument("--log_freq", type=int, default=100)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    # Budget lookup key: iu/iu_u -> iu, ga/ga_u -> ga, gd/gd_u/lora* -> gd.
    method_base = {"iu": "iu", "ga": "ga"}.get(args.method.split("_")[0], "gd")
    training_steps = args.training_steps or cfg.train.training_steps.get(
        method_base, 200
    )
    batch_size = args.batch_size or cfg.train.batch_size

    dataset = create_dataset(args.dataset, train=True)
    remaining_idx, removed_idx = setup_removal(args, dataset)
    if len(removed_idx) == 0 or len(remaining_idx) == 0:
        raise SystemExit("unlearning needs nonempty remaining and removed sets")

    # LDM workloads (celeba): unlearn in VQ latent space, like training, and
    # decode sampled latents for scoring (reference unlearn.py encodes via
    # the pipeline's frozen vqvae; calculate_local_scores.py:357-358).
    decode_fn = None
    train_ds = dataset
    if cfg.vqvae is not None:
        from ..data.datasets import ArrayDataset
        from ..models.vqvae import load_vqvae, precompute_latents

        vqvae, vq_vars = load_vqvae(cfg.vqvae, args.vqvae_weights)
        cache = os.path.join(args.outdir, args.dataset, "precomputed_emb",
                             "vqvae_latents.npy")
        latents = precompute_latents(
            vqvae, vq_vars, dataset.images, batch_size=32, cache_path=cache
        ) * cfg.vqvae.scaling_factor
        train_ds = ArrayDataset(latents, dataset.labels)
        scale = cfg.vqvae.scaling_factor

        def decode_fn(z):
            return vqvae.apply(vq_vars, z / scale, method=vqvae.decode)

    spec = cfg.unet
    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    t0j = jnp.zeros((1,), jnp.int32)
    params0 = model.init(jax.random.PRNGKey(0), x0, t0j)["params"]
    tx_probe = make_optimizer("adam", lr=1e-4)
    state, meta = load_checkpoint(args.load, TrainState.create(params0, tx_probe))
    loaded_spec = load_unet_spec(meta)
    if loaded_spec is not None and loaded_spec != spec:
        spec = loaded_spec
        model = UNet2D(spec)
    params = state.params

    schedule = make_schedule(cfg.scheduler)
    opt = cfg.train.optimizer
    unlearn_start = time.time()

    if args.method in ("iu", "iu_u"):
        new_params = influence_unlearn(
            model.apply, params, schedule, cfg.scheduler,
            train_ds.images[removed_idx], train_ds.images[remaining_idx],
            alpha=args.iu_ratio, batch_size=min(batch_size, 32),
            wf_batches=args.wf_batches, seed=args.opt_seed,
        )
        final = TrainState.create(new_params, tx_probe)
    elif args.method in ("lora", "lora_u"):
        tree = lora_init(params, rank=args.lora_rank,
                         key=jax.random.PRNGKey(args.opt_seed))
        tx = make_optimizer("adamw", lr=args.lr or 1e-4)
        opt_state = tx.init(tree)
        subset = train_ds.subset(remaining_idx)
        batches = batch_iterator(subset, min(batch_size, len(subset)), args.opt_seed)

        from ..diffusion.schedulers import add_noise, antithetic_timesteps

        @jax.jit
        def lora_step(tree, opt_state, images, key):
            k_t, k_n = jax.random.split(key)
            t = antithetic_timesteps(k_t, images.shape[0],
                                     cfg.scheduler.num_train_timesteps)
            noise = jax.random.normal(k_n, images.shape)

            def loss_fn(lo):
                from ..models.lora import lora_collection

                x_t = add_noise(schedule, images, noise, t)
                eps = model.apply(
                    {"params": params, "lora": lora_collection(lo)}, x_t, t
                )
                return jnp.mean((eps - noise) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(tree)
            updates, opt_state = tx.update(grads, opt_state, tree)
            return optax.apply_updates(tree, updates), opt_state, loss

        for i in range(training_steps):
            images, _ = next(batches)
            tree, opt_state, loss = lora_step(
                tree, opt_state, jnp.asarray(images),
                jax.random.PRNGKey(args.opt_seed + i),
            )
            if (i + 1) % args.log_freq == 0:
                print(f"Step[{i + 1}/{training_steps}] loss={float(loss):.5f}", flush=True)
        final = TrainState.create(lora_merge(params, tree), tx_probe)
    else:  # gd / gd_u / ga / ga_u fine-tuning loops
        ga = args.method.startswith("ga")
        tx = make_optimizer(
            opt.name, lr=args.lr or opt.lr, weight_decay=opt.weight_decay,
            grad_clip_norm=opt.grad_clip_norm, maximize=ga,
        )
        st = TrainState.create(params, tx)
        step_fn = jax.jit(make_train_step(model.apply, tx, schedule, cfg.scheduler))
        train_idx = removed_idx if ga else remaining_idx
        subset = train_ds.subset(train_idx)
        batches = batch_iterator(subset, min(batch_size, len(subset)), args.opt_seed)
        for i in range(training_steps):
            images, _ = next(batches)
            st, metrics = step_fn(st, jnp.asarray(images),
                                  jax.random.PRNGKey(args.opt_seed + i))
            if (i + 1) % args.log_freq == 0:
                print(f"Step[{i + 1}/{training_steps}] "
                      f"loss={float(metrics['loss']):.5f}", flush=True)
        final = st
    unlearn_time = time.time() - unlearn_start

    model_dir = model_output_dir(
        args.outdir, args.dataset, args.method, args.removal_dist,
        args.removal_seed,
        args.datamodel_alpha if args.removal_dist == "datamodel" else None,
    )
    save_removal_indices(model_dir, remaining_idx, removed_idx)

    scores = {}
    sampling_time = 0.0
    if args.model_behavior != "none":
        shape = (args.n_samples, spec.sample_size, spec.sample_size, spec.in_channels)
        sampler = make_sampler(
            model.apply, cfg.scheduler, shape,
            num_inference_steps=args.num_inference_steps, kind="ddim",
            decode_fn=decode_fn,
        )
        t0 = time.time()
        samples = np.asarray(sampler(final.ema_params, jax.random.PRNGKey(42)))
        sampling_time = time.time() - t0

        if args.model_behavior == "global":
            from ..attributions.global_scores import (
                calculate_diversity_score,
                calculate_fid_from_features,
                compute_precision_recall,
                inception_score_from_logits,
                load_inception,
                make_feature_fn,
            )

            inc, variables = load_inception(None)
            extract = make_feature_fn(inc, variables)
            s3 = samples if samples.shape[-1] == 3 else np.repeat(samples, 3, -1)
            gen_feats, gen_logits = extract(s3)
            ref_imgs = dataset.images[: 4 * args.n_samples] / 2 + 0.5
            if ref_imgs.shape[-1] == 1:
                ref_imgs = np.repeat(ref_imgs, 3, -1)
            ref_feats, _ = extract(ref_imgs)
            if cfg.vqvae is not None:
                # celeba workload: the global behavior is demographic
                # diversity entropy, not FID (reference unlearn.py:787-803).
                div = calculate_diversity_score(ref_feats, gen_feats)
                scores["entropy"] = div["entropy"]
                scores["cluster_count"] = div["cluster_count"]
                scores["cluster_proportions"] = div["cluster_proportions"]
            else:
                scores["fid_value"] = calculate_fid_from_features(
                    gen_feats, ref_features=ref_feats
                )
                scores["is"], scores["is_std"] = inception_score_from_logits(gen_logits)
                scores["precision"], scores["recall"] = compute_precision_recall(
                    ref_feats, gen_feats
                )
        else:  # local: paired behaviors vs the full model
            from ..utils.image_metrics import mse, nrmse, ssim

            full_sampler = make_sampler(
                model.apply, cfg.scheduler, shape,
                num_inference_steps=args.num_inference_steps, kind="ddim",
                decode_fn=decode_fn,
            )
            full_imgs = full_sampler(state.ema_params, jax.random.PRNGKey(42))
            scores["avg_mse"] = float(np.mean(np.asarray(mse(full_imgs, samples))))
            scores["avg_nrmse"] = float(np.mean(np.asarray(nrmse(full_imgs, samples))))
            scores["avg_ssim"] = float(np.mean(np.asarray(ssim(full_imgs, samples))))

    db = args.db or os.path.join(args.outdir, f"{args.dataset}_unlearn_db.jsonl")
    append_record(
        db,
        provenance_row(
            args,
            **scores,
            remaining_idx=remaining_idx,
            removed_idx=removed_idx,
            unlearn_time=unlearn_time,
            sampling_time=sampling_time,
            model_dir=model_dir,
        ),
    )
    print(f"{args.method} done in {unlearn_time:.1f}s; scores={scores} -> {db}")


if __name__ == "__main__":
    main()
