"""Train a VQ-VAE for a latent-diffusion workload.

The reference never trains its VQ-VAE — the CelebA-HQ LDM uses the frozen
pretrained CompVis tower (reference src/diffusion_utils.py:253-276). In a
zero-egress environment a random encoder erases the class signal the
attribution pipeline needs (latent-space LDS collapses to ~0 — ROADMAP
round-1 findings), so this CLI trains a real one on-device: standard VQ-VAE
objective (reconstruction + codebook + beta * commitment, straight-through
estimator) with the whole dataset resident and the step jitted.

Weights save to an .npy params dict that models.vqvae.load_vqvae and every
--vqvae_weights flag consume directly.

Usage (smoke):
    python -m group_attribution_for_diffusion_models_tpu.cli.train_vqvae \
        --dataset synthetic_64x8_ldm --outdir /tmp/vq --training_steps 20
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..data import create_dataset
from ..utils import append_record
from .common import config_for, provenance_row


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, required=True,
                        help="an LDM dataset (config must carry a vqvae spec)")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--weights_out", type=str, default=None,
                        help="default <outdir>/<dataset>/vqvae/vqvae_weights.npy")
    parser.add_argument("--training_steps", type=int, default=2000)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--lr", type=float, default=2e-4)
    parser.add_argument("--beta", type=float, default=0.25,
                        help="commitment-loss weight")
    parser.add_argument("--opt_seed", type=int, default=0)
    parser.add_argument("--log_freq", type=int, default=100)
    parser.add_argument("--db", type=str, default=None)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    import optax

    from ..models.vqvae import VQVAE

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    if cfg.vqvae is None:
        raise SystemExit(
            f"dataset {args.dataset!r} has no vqvae spec (not an LDM workload)"
        )
    spec = cfg.vqvae
    model = VQVAE(spec)

    dataset = create_dataset(args.dataset, train=True)
    images = jnp.asarray(dataset.images, jnp.float32)  # [-1, 1] NHWC
    n = images.shape[0]
    batch = min(args.batch_size, n)

    variables = model.init(
        jax.random.PRNGKey(args.opt_seed),
        jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels)),
    )
    params = variables["params"]
    tx = optax.adam(args.lr)
    opt_state = tx.init(params)
    beta = args.beta

    def loss_fn(params, x):
        z = model.apply({"params": params}, x, method=VQVAE.encode)
        zq, idx = model.apply({"params": params}, z, method=VQVAE.quantize)
        # Straight-through: decoder sees quantized values, encoder gets the
        # gradient as if the quantizer were identity.
        z_st = z + jax.lax.stop_gradient(zq - z)
        recon = model.apply({"params": params}, z_st, True, method=VQVAE.decode)
        rec = jnp.mean((recon - x) ** 2)
        codebook = jnp.mean((jax.lax.stop_gradient(z) - zq) ** 2)
        commit = jnp.mean((z - jax.lax.stop_gradient(zq)) ** 2)
        counts = jnp.bincount(
            idx.reshape(-1), length=spec.num_vq_embeddings
        ) / idx.size
        perplexity = jnp.exp(
            -jnp.sum(jnp.where(counts > 0, counts * jnp.log(counts), 0.0))
        )
        return rec + codebook + beta * commit, {
            "recon": rec, "perplexity": perplexity
        }

    @jax.jit
    def step(params, opt_state, key):
        ix = jax.random.randint(key, (batch,), 0, n)
        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, images[ix]
        )
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss, aux

    t0 = time.time()
    loss = aux = None
    for i in range(args.training_steps):
        params, opt_state, loss, aux = step(
            params, opt_state,
            jax.random.PRNGKey(args.opt_seed * 1_000_003 + i),
        )
        if (i + 1) % args.log_freq == 0 or i + 1 == args.training_steps:
            print(
                f"Step[{i + 1}/{args.training_steps}] loss={float(loss):.5f} "
                f"recon={float(aux['recon']):.5f} "
                f"perplexity={float(aux['perplexity']):.1f}",
                flush=True,
            )
    train_time = time.time() - t0

    weights_out = args.weights_out or os.path.join(
        args.outdir, args.dataset, "vqvae", "vqvae_weights.npy"
    )
    os.makedirs(os.path.dirname(os.path.abspath(weights_out)), exist_ok=True)
    np.save(weights_out, jax.tree_util.tree_map(np.asarray, params))
    print(f"saved VQ-VAE weights: {weights_out}")

    db = args.db or os.path.join(args.outdir, f"{args.dataset}_vqvae_db.jsonl")
    append_record(
        db,
        provenance_row(
            args,
            loss=float(loss) if loss is not None else None,
            recon=float(aux["recon"]) if aux else None,
            perplexity=float(aux["perplexity"]) if aux else None,
            train_time=train_time,
            weights_out=weights_out,
        ),
    )


if __name__ == "__main__":
    main()
