"""Compute projected per-sample gradient features (TRAK / D-TRAK inputs).

CLI mirror of reference src/attributions/methods/d_trak_grad.py:229-800 and
text_to_image/grad_text_to_image_lora.py:255-823, minus their machinery: in
JAX the per-sample gradient is jax.vmap(jax.grad) (no SDPA deletion needed)
and the projection is the Pallas JL kernel fused after the gradient — the
(B, n_params) matrix never materializes beyond one batch tile.

Sources: the training set (--source train) or generated samples
(--source generated, sampled on the fly). Output: an .npz feature store
{train_features | gen_features, group_labels} consumed by cli.traks, plus a
group.csv mapping rows to units (reference grad_text_to_image_lora.py:443-450).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..attributions.methods.trak import OUTPUT_FNS, make_grad_feature_fn
from ..data import create_dataset
from ..diffusion import make_schedule
from ..diffusion.sampling import sample_loop
from ..models import UNet2D
from ..training import TrainState, make_optimizer
from ..utils.ckpt import load_checkpoint, load_unet_spec
from .common import add_common_args, config_for


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--load", type=str, required=True, help="model dir")
    parser.add_argument("--source", type=str, default="train",
                        choices=["train", "generated", "generated_journey"])
    parser.add_argument("--output_fn", type=str, default="loss",
                        choices=list(OUTPUT_FNS))
    parser.add_argument("--proj_dim", type=int, default=4096)
    parser.add_argument("--num_timesteps", type=int, default=10)
    parser.add_argument("--t_strategy", type=str, default="uniform",
                        choices=["uniform", "cumulative"])
    parser.add_argument("--proj_seed", type=int, default=0)
    parser.add_argument("--grad_mode", type=str, default="full",
                        choices=["full", "probe", "attn_full"],
                        help="probe = Kronecker-probe gradient sketching "
                             "(attention projections only; per-sample "
                             "gradients are sketched in the backward pass, "
                             "never materialized — orders-of-magnitude "
                             "lighter than full per-sample grads); "
                             "attn_full = exact per-sample grads restricted "
                             "to the same attention projections (the "
                             "apples-to-apples baseline for probe, and the "
                             "reference's own SD feature choice, "
                             "grad_text_to_image_lora.py:776-820)")
    parser.add_argument("--sketch_k", type=int, default=64,
                        help="input-side sketch rows per projection "
                             "(--grad_mode probe)")
    parser.add_argument("--batch_size", type=int, default=32)
    parser.add_argument("--n_samples", type=int, default=64,
                        help="generated-source sample count")
    parser.add_argument("--max_examples", type=int, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    spec = cfg.unet
    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    params0 = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))["params"]
    state, meta = load_checkpoint(
        args.load, TrainState.create(params0, make_optimizer("adam", lr=1e-4))
    )
    loaded_spec = load_unet_spec(meta)
    if loaded_spec is not None and loaded_spec != spec:
        model = UNet2D(loaded_spec)
    params = state.params

    schedule = make_schedule(cfg.scheduler)

    if args.source == "generated_journey":
        # Journey TRAK: gradients at the latents actually visited during
        # sampling (reference d_trak_grad.py:450-494).
        from ..attributions.methods.trak import make_journey_feature_fn
        from ..diffusion.sampling import sample_with_trajectory

        shape = (args.n_samples, spec.sample_size, spec.sample_size, spec.in_channels)
        _, traj, ts = sample_with_trajectory(
            model.apply, state.ema_params, schedule, cfg.scheduler, shape,
            jax.random.PRNGKey(args.seed),
            num_inference_steps=args.num_inference_steps,
        )
        journey_fn = make_journey_feature_fn(
            model.apply, schedule, cfg.scheduler,
            output_fn=args.output_fn, proj_dim=args.proj_dim,
            proj_seed=args.proj_seed,
        )
        feats = np.asarray(
            journey_fn(params, traj, ts, jax.random.PRNGKey(args.seed + 1))
        )
        os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
        # group_labels always refers to TRAIN rows (the aggregation axis);
        # generated-side features never touch it.
        payload = {"gen_features": feats}
        if os.path.exists(args.save_path):
            old = dict(np.load(args.save_path))
            old.update(payload)
            payload = old
        np.savez(args.save_path, **payload)
        print(f"journey gen_features {feats.shape} -> {args.save_path}")
        return

    sketch_probe = None
    params_filter = None
    if args.grad_mode == "probe":
        from ..models.lora import probe_sketch_init

        sketch_probe = probe_sketch_init(
            params, k=args.sketch_k, key=jax.random.PRNGKey(args.proj_seed)
        )
        if not sketch_probe:
            raise SystemExit(
                "--grad_mode probe needs attention projections "
                "(to_q/to_k/to_v/to_out) in the model; this architecture "
                "has none"
            )
    elif args.grad_mode == "attn_full":
        from ..models.lora import attention_params_filter

        params_filter = attention_params_filter(params)
        if params_filter is None:
            raise SystemExit(
                "--grad_mode attn_full needs attention projections "
                "(to_q/to_k/to_v/to_out) in the model; this architecture "
                "has none"
            )
    feat_fn = make_grad_feature_fn(
        model.apply, schedule, cfg.scheduler,
        output_fn=args.output_fn, proj_dim=args.proj_dim,
        num_timesteps=args.num_timesteps, t_strategy=args.t_strategy,
        proj_seed=args.proj_seed, sketch_probe=sketch_probe,
        params_filter=params_filter,
    )

    if args.source == "train":
        dataset = create_dataset(args.dataset, train=True)
        images = dataset.images
        labels = dataset.labels
        if cfg.vqvae is not None:
            # LDM workloads: gradients live in the VQ latent space the U-Net
            # was trained in (the reference computes d_trak grads through the
            # latent pipeline the same way); reuse the shared encode cache.
            from ..models.vqvae import load_vqvae, precompute_latents

            vqvae, vq_vars = load_vqvae(cfg.vqvae, args.vqvae_weights)
            cache = os.path.join(args.outdir, args.dataset, "precomputed_emb",
                                 "vqvae_latents.npy")
            images = (
                precompute_latents(vqvae, vq_vars, images, batch_size=32,
                                   cache_path=cache)
                * cfg.vqvae.scaling_factor
            )
    else:
        shape = (args.n_samples, spec.sample_size, spec.sample_size, spec.in_channels)

        @jax.jit
        def gen(key):
            return sample_loop(
                model.apply, state.ema_params, schedule, cfg.scheduler, shape,
                key, num_inference_steps=args.num_inference_steps, kind="ddim",
                postprocess=cfg.vqvae is None,
            )

        images = np.asarray(gen(jax.random.PRNGKey(args.seed)))
        if cfg.vqvae is None:
            images = images * 2.0 - 1.0  # [0,1] pixels back to model space
        labels = np.zeros(len(images), np.int64)
    if args.max_examples:
        images, labels = images[: args.max_examples], labels[: args.max_examples]

    # Stream projected features straight to a disk-backed array — the
    # reference's np.memmap pattern for 50k-example stores
    # (reference d_trak_grad.py:496-501); nothing but one batch of projected
    # rows is ever resident on host.
    from numpy.lib.format import open_memmap

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    mm_path = args.save_path.replace(".npz", "") + f"_{args.source}_mm.npy"
    feats = open_memmap(
        mm_path, mode="w+", dtype=np.float32, shape=(len(images), args.proj_dim)
    )
    for i in range(0, len(images), args.batch_size):
        batch = jnp.asarray(images[i : i + args.batch_size])
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        feats[i : i + args.batch_size] = np.asarray(feat_fn(params, batch, key))
        print(f"{min(i + args.batch_size, len(images))}/{len(images)} examples", flush=True)
    feats.flush()
    feats = np.asarray(feats)

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)
    if args.source == "train":
        payload = {"train_features": feats, "group_labels": labels}
    else:
        payload = {"gen_features": feats}  # labels belong to the train axis
    if os.path.exists(args.save_path):
        # Merge with an existing store (train + generated built separately).
        old = dict(np.load(args.save_path))
        old.update(payload)
        payload = old
    np.savez(args.save_path, **payload)
    with open(args.save_path.replace(".npz", "") + "_group.csv", "w") as f:
        f.write("row,group\n")
        f.writelines(f"{i},{g}\n" for i, g in enumerate(labels))
    kind = "train_features" if args.source == "train" else "gen_features"
    print(f"{kind} {feats.shape} -> {args.save_path}")


if __name__ == "__main__":
    main()
