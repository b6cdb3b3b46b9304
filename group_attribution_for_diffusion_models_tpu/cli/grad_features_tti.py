"""Projected per-sample LoRA gradient features for the SD workload.

CLI mirror of reference text_to_image/grad_text_to_image_lora.py:255-823:
D-TRAK/TRAK features differentiated with respect to the LoRA parameters only,
under text conditioning, for three sources — the training set, freshly
generated latents, and the generated sampling trajectory (Journey TRAK).
In JAX the per-sample gradient is jax.vmap(jax.grad) with no SDPA-deletion
hack, and projection is the Pallas JL kernel fused after the gradient.

Output: an .npz feature store {train_features | gen_features, group_labels}
consumed by cli.traks, plus group.csv mapping train rows to artist units
(reference grad_text_to_image_lora.py:443-450).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..attributions.methods.trak import (
    OUTPUT_FNS,
    make_grad_feature_fn,
    make_journey_feature_fn,
)
from ..config.registry import (
    MINISD_SCHEDULER,
    MINISD_UNET,
    PROMPTS_ARTBENCH,
    SchedulerSpec,
)
from ..data import create_dataset
from ..diffusion import make_schedule
from ..models import UNet2D
from ..models.clip_text import CLIPTextEncoder
from ..models.lora import lora_merge
from .common import add_sd_pretrained_args, sd_base_params, sd_text_params
from .train_text_to_image_lora import _load_lora_npz, tiny_sd_spec


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, default="artbench")
    parser.add_argument("--cls", type=str, default="post_impressionism")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--lora_dir", type=str, required=True,
                        help="trained LoRA .npz whose params are differentiated")
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
                        choices=["full", "probe"],
                        help="probe = Kronecker-probe gradient sketching of "
                             "the merged model's attention projections "
                             "(per-sample grads sketched in the backward, "
                             "never materialized)")
    parser.add_argument("--sketch_k", type=int, default=64,
                        help="input-side sketch rows per projection "
                             "(--grad_mode probe)")
    parser.add_argument("--batch_size", type=int, default=16)
    parser.add_argument("--n_samples", type=int, default=50)
    parser.add_argument("--num_inference_steps", type=int, default=100)
    parser.add_argument("--max_examples", type=int, default=None)
    parser.add_argument("--save_path", type=str, required=True)
    parser.add_argument("--vae_weights", type=str, default=None)
    parser.add_argument("--seed", type=int, default=42)
    add_sd_pretrained_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    synthetic = args.dataset.startswith("synthetic")

    dataset = create_dataset(args.dataset, train=True)
    if synthetic:
        files = [f"artist-{l}_work_{i}.jpg" for i, l in enumerate(dataset.labels)]
        spec, sched_spec = tiny_sd_spec(dataset.images.shape[1]), SchedulerSpec()
        text = CLIPTextEncoder(width=spec.cross_attention_dim, layers=2, heads=2)
        latent_size, latent_ch = spec.sample_size, 4
    else:
        if dataset.names is None:
            raise SystemExit("artbench dataset needs per-image filenames")
        files = dataset.names
        spec, sched_spec = MINISD_UNET, MINISD_SCHEDULER
        text = CLIPTextEncoder()
        latent_size, latent_ch = 32, 4

    from ..data.groups import artist_from_filename

    units = sorted({artist_from_filename(f) for f in files})
    unit_index = {u: i for i, u in enumerate(units)}
    group_labels = np.asarray(
        [unit_index[artist_from_filename(f)] for f in files], np.int64
    )

    model = UNet2D(spec)
    x0 = jnp.zeros((1, latent_size, latent_size, latent_ch))
    ehs0 = jnp.zeros((1, 77, spec.cross_attention_dim))
    base_params = sd_base_params(args, model.init(
        jax.random.PRNGKey(args.seed), x0, jnp.zeros((1,), jnp.int32), ehs0
    )["params"])
    text_params, tokenize = sd_text_params(args, text)

    lora = _load_lora_npz(args.lora_dir)
    schedule = make_schedule(sched_spec)

    # (base, lora) both enter the jitted extractor as ARGUMENTS — closure-
    # captured towers would serialize the 860M base into the HLO payload.
    def params_filter(p):
        base, lo = p
        return lo, lambda tr: lora_merge(base, tr)

    prompt = PROMPTS_ARTBENCH.get(args.cls, f"a painting, {args.cls}")
    unit_prompts = [f"{prompt} by {u}" for u in units]
    unit_emb = np.asarray(
        text.apply({"params": text_params}, jnp.asarray(tokenize(unit_prompts)))
    )

    os.makedirs(os.path.dirname(os.path.abspath(args.save_path)), exist_ok=True)

    if args.source == "generated_journey":
        merged = lora_merge(base_params, lora)
        prompt_emb = np.asarray(
            text.apply({"params": text_params}, jnp.asarray(tokenize([prompt])))
        )
        ehs_b = jnp.broadcast_to(
            jnp.asarray(prompt_emb), (args.n_samples,) + prompt_emb.shape[1:]
        )
        from ..diffusion.sampling import sample_with_trajectory

        shape = (args.n_samples, latent_size, latent_size, latent_ch)
        _, traj, ts = sample_with_trajectory(
            model.apply, merged, schedule, sched_spec, shape,
            jax.random.PRNGKey(args.seed),
            num_inference_steps=args.num_inference_steps,
            encoder_hidden_states=ehs_b,
        )
        journey_fn = make_journey_feature_fn(
            model.apply, schedule, sched_spec,
            output_fn=args.output_fn, proj_dim=args.proj_dim,
            proj_seed=args.proj_seed, params_filter=params_filter,
            conditional=True,
        )
        feats = np.asarray(journey_fn(
            (base_params, lora), traj, ts, jax.random.PRNGKey(args.seed + 1),
            ehs_b,
        ))
        payload = {"gen_features": feats}
        if os.path.exists(args.save_path):
            old = dict(np.load(args.save_path))
            old.update(payload)
            payload = old
        np.savez(args.save_path, **payload)
        print(f"journey gen_features {feats.shape} -> {args.save_path}")
        return

    if args.grad_mode == "probe":
        # The probe occupies the "lora" collection, so the trained LoRA is
        # merged into the base first; the sketch then covers every attention
        # projection of the merged model (a superset of the LoRA-only
        # feature family, still attention-projections-only like the
        # reference's own SD path).
        from ..models.lora import probe_sketch_init

        feat_params = lora_merge(base_params, lora)
        sketch_probe = probe_sketch_init(
            feat_params, k=args.sketch_k,
            key=jax.random.PRNGKey(args.proj_seed),
        )
        feat_fn = make_grad_feature_fn(
            model.apply, schedule, sched_spec,
            output_fn=args.output_fn, proj_dim=args.proj_dim,
            num_timesteps=args.num_timesteps, t_strategy=args.t_strategy,
            proj_seed=args.proj_seed, sketch_probe=sketch_probe,
            conditional=True,
        )
    else:
        feat_params = (base_params, lora)
        feat_fn = make_grad_feature_fn(
            model.apply, schedule, sched_spec,
            output_fn=args.output_fn, proj_dim=args.proj_dim,
            num_timesteps=args.num_timesteps, t_strategy=args.t_strategy,
            proj_seed=args.proj_seed, params_filter=params_filter,
            conditional=True,
        )

    if args.source == "train":
        if synthetic:  # the trainer's fake channel-mean encode
            latents = np.repeat(
                dataset.images.mean(axis=-1, keepdims=True), latent_ch, axis=-1
            ).astype(np.float32)
        else:
            from ..config.registry import MINISD_VAE
            from ..models.vqvae import load_sd_vae, precompute_latents

            vae, vae_vars = load_sd_vae(MINISD_VAE, args.vae_weights)
            latents = precompute_latents(
                vae, vae_vars, dataset.images,
                cache_path=os.path.join(args.outdir, "precomputed_emb",
                                        "vae_latents.npy"),
            )
        ehs_rows = unit_emb[group_labels]
        labels = group_labels
        key_name = "train_features"
    else:  # generated
        merged = lora_merge(base_params, lora)
        prompt_emb = np.asarray(
            text.apply({"params": text_params}, jnp.asarray(tokenize([prompt])))
        )
        from ..diffusion.sampling import sample_loop

        shape = (args.n_samples, latent_size, latent_size, latent_ch)

        @jax.jit
        def gen(key):
            return sample_loop(
                model.apply, merged, schedule, sched_spec, shape, key,
                num_inference_steps=args.num_inference_steps, kind="ddim",
                encoder_hidden_states=jnp.broadcast_to(
                    jnp.asarray(prompt_emb), (args.n_samples,) + prompt_emb.shape[1:]
                ),
                postprocess=False,
            )

        latents = np.asarray(gen(jax.random.PRNGKey(args.seed)))
        ehs_rows = np.broadcast_to(
            prompt_emb, (len(latents),) + prompt_emb.shape[1:]
        )
        labels = np.zeros(len(latents), np.int64)
        key_name = "gen_features"

    if args.max_examples:
        latents = latents[: args.max_examples]
        ehs_rows = ehs_rows[: args.max_examples]
        labels = labels[: args.max_examples]

    from numpy.lib.format import open_memmap

    mm_path = args.save_path.replace(".npz", "") + f"_{args.source}_mm.npy"
    feats = open_memmap(
        mm_path, mode="w+", dtype=np.float32,
        shape=(len(latents), args.proj_dim),
    )
    for i in range(0, len(latents), args.batch_size):
        batch = jnp.asarray(latents[i : i + args.batch_size])
        ehs_b = jnp.asarray(ehs_rows[i : i + args.batch_size])
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), i)
        feats[i : i + args.batch_size] = np.asarray(
            feat_fn(feat_params, batch, key, ehs_b)
        )
        print(f"{min(i + args.batch_size, len(latents))}/{len(latents)} examples",
              flush=True)
    feats.flush()

    payload = {key_name: np.asarray(feats)}
    if key_name == "train_features":
        payload["group_labels"] = labels
        with open(os.path.join(os.path.dirname(os.path.abspath(args.save_path)),
                               "group.csv"), "w") as f:
            f.write("row,unit\n")
            for i, fname in enumerate(files[: len(latents)]):
                f.write(f"{i},{artist_from_filename(fname)}\n")
    if os.path.exists(args.save_path):
        old = dict(np.load(args.save_path))
        old.update(payload)
        payload = old
    np.savez(args.save_path, **payload)
    print(f"{key_name} {np.asarray(feats).shape} -> {args.save_path}")


if __name__ == "__main__":
    main()
