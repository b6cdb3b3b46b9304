"""Paired local model behaviors: full model vs removal model, same seeds.

CLI mirror of reference unconditional_generation/calculate_local_scores.py
(:25,303-374): generate images from the full and the subset model with
identical PRNG keys, compute per-image MSE / NRMSE / SSIM plus the diffusion
loss across inference timesteps, and append a JSONL row with per-image and
averaged behaviors. Deterministic-by-key DDIM makes the pairing exact.
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..diffusion import add_noise, make_schedule
from ..diffusion.sampling import make_sampler
from ..models import UNet2D
from ..training import TrainState, make_optimizer
from ..utils import append_record
from ..utils.ckpt import load_checkpoint, load_unet_spec
from ..utils.image_metrics import mse, nrmse, ssim
from .common import add_common_args, config_for, provenance_row


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--full_model_dir", type=str, required=True)
    parser.add_argument("--removal_model_dir", type=str, required=True)
    parser.add_argument("--n_samples", type=int, default=16)
    parser.add_argument("--n_noises", type=int, default=4,
                        help="noise draws for the diffusion-loss behavior")
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def _load(model_dir, cfg):
    import jax
    import jax.numpy as jnp

    spec = cfg.unet
    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))["params"]
    state, meta = load_checkpoint(
        model_dir, TrainState.create(params, make_optimizer("adam", lr=1e-4))
    )
    loaded_spec = load_unet_spec(meta)
    if loaded_spec is not None and loaded_spec != spec:
        model = UNet2D(loaded_spec)
    return model, state, meta


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    spec = cfg.unet

    full_model, full_state, _ = _load(args.full_model_dir, cfg)
    rem_model, rem_state, rem_meta = _load(args.removal_model_dir, cfg)

    # LDM workloads: decode sampled latents to pixels for the image metrics,
    # re-encode for the diffusion loss (reference calculate_local_scores.py
    # :298,:357-358 round-trips through the frozen vqvae the same way).
    vqvae = vq_vars = None
    decode_fn = None
    if cfg.vqvae is not None:
        from ..models.vqvae import load_vqvae

        vqvae, vq_vars = load_vqvae(cfg.vqvae, args.vqvae_weights)
        scale = cfg.vqvae.scaling_factor

        def decode_fn(z):
            return vqvae.apply(vq_vars, z / scale, method=vqvae.decode)

    shape = (args.n_samples, spec.sample_size, spec.sample_size, spec.in_channels)
    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    full_sampler = make_sampler(
        full_model.apply, cfg.scheduler, shape,
        num_inference_steps=args.num_inference_steps, kind="ddim",
        decode_fn=decode_fn,
    )
    rem_sampler = make_sampler(
        rem_model.apply, cfg.scheduler, shape,
        num_inference_steps=args.num_inference_steps, kind="ddim",
        decode_fn=decode_fn,
    )
    imgs_full = full_sampler(full_state.ema_params, key)
    imgs_rem = rem_sampler(rem_state.ema_params, key)  # SAME key: paired seeds
    gen_time = time.time() - t0

    mses = np.asarray(mse(imgs_full, imgs_rem))
    nrmses = np.asarray(nrmse(imgs_full, imgs_rem))
    ssims = np.asarray(ssim(imgs_full, imgs_rem))

    # Diffusion loss of the removal model on the full model's generations,
    # averaged over timesteps x noises (reference :339-374).
    schedule = make_schedule(cfg.scheduler)
    x = imgs_full * 2.0 - 1.0
    if vqvae is not None:
        x = vqvae.apply(vq_vars, x, method=vqvae.encode) * cfg.vqvae.scaling_factor

    @jax.jit
    def diff_loss(params, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(
            k_t, (x.shape[0],), 0, cfg.scheduler.num_train_timesteps
        )
        noise = jax.random.normal(k_n, x.shape)
        x_t = add_noise(schedule, x, noise, t)
        eps = rem_model.apply({"params": params}, x_t, t)
        return jnp.mean((eps - noise) ** 2, axis=(1, 2, 3))

    losses = np.mean(
        [
            np.asarray(diff_loss(rem_state.params, jax.random.fold_in(key, i)))
            for i in range(args.n_noises)
        ],
        axis=0,
    )

    row = provenance_row(
        args,
        remaining_idx=rem_meta.get("remaining_idx", []),
        removed_idx=rem_meta.get("removed_idx", []),
        generation_time=gen_time,
        avg_mse=float(mses.mean()),
        avg_nrmse=float(nrmses.mean()),
        avg_ssim=float(ssims.mean()),
        avg_total_loss=float(losses.mean()),
        **{
            f"generated_image_{i}_{k}": float(v[i])
            for i in range(args.n_samples)
            for k, v in [("mse", mses), ("nrmse", nrmses), ("ssim", ssims),
                         ("simple_loss", losses)]
        },
    )
    db = args.db or os.path.join(args.outdir, f"{args.dataset}_local_db.jsonl")
    append_record(db, row)
    print(
        f"avg_mse={mses.mean():.5f} avg_ssim={ssims.mean():.4f} "
        f"avg_nrmse={nrmses.mean():.4f} avg_loss={losses.mean():.5f} -> {db}"
    )


if __name__ == "__main__":
    main()
