"""Model behaviors for text-to-image subset LoRAs: paired generation + scoring.

CLI mirror of reference text_to_image/compute_model_behaviors.py:167-516, the
model-behavior engine of the SD use case: generate images from the reference
(full-LoRA) pipeline and the subset-LoRA pipeline with the same keys, then
score per image — SSIM, NRMSE, CLIP similarity (gen-vs-gen), CLIP prompt
score (gen-vs-prompt), aesthetic score, and the simple diffusion loss over
inference timesteps x noises — and append a JSONL row with per-image
behaviors, global aggregates (mean + 0.5/0.75/0.9 quantiles), per-metric
wall-times, and the removal indices. Duplicate-record guard included
(reference :169-191).
"""

from __future__ import annotations

import argparse
import os
import time

import numpy as np

from ..config.registry import (
    MINISD_SCHEDULER,
    MINISD_UNET,
    PROMPTS_ARTBENCH,
    SchedulerSpec,
)
from ..diffusion import add_noise, make_schedule
from ..diffusion.sampling import sample_loop
from ..models import UNet2D
from ..models.clip_text import CLIPTextEncoder
from ..models.clip_vision import AestheticHead, load_clip_vision, make_embed_fn
from ..models.lora import lora_merge
from ..utils import append_record, has_record
from ..utils.image_metrics import nrmse, ssim
from .common import (
    add_sd_pretrained_args,
    provenance_row,
    sd_base_params,
    sd_text_params,
)
from .train_text_to_image_lora import _load_lora_npz, tiny_sd_spec


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, default="artbench")
    parser.add_argument("--cls", type=str, default="post_impressionism")
    parser.add_argument("--outdir", type=str, required=True)
    parser.add_argument("--db", type=str, required=True)
    parser.add_argument("--reference_lora_dir", type=str, default=None,
                        help="full-model LoRA npz (the paired reference)")
    parser.add_argument("--lora_dir", type=str, required=True,
                        help="subset LoRA npz to score")
    parser.add_argument("--method", type=str, default="retrain")
    parser.add_argument("--removal_dist", type=str, default="shapley")
    parser.add_argument("--removal_seed", type=int, default=0)
    parser.add_argument("--n_samples", type=int, default=50)
    parser.add_argument("--num_inference_steps", type=int, default=100)
    parser.add_argument("--n_noises", type=int, default=3)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--no_duplicate", action="store_true", default=True)
    parser.add_argument("--clip_weights", type=str, default=None)
    parser.add_argument("--aesthetic_weights", type=str, default=None)
    parser.add_argument("--vae_weights", type=str, default=None,
                        help="converted AutoencoderKL params (.npy) for "
                             "decoding SD latents before image metrics")
    add_sd_pretrained_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    synthetic = args.dataset.startswith("synthetic")

    guard = {
        "lora_dir": args.lora_dir,
        "removal_dist": args.removal_dist,
        "removal_seed": args.removal_seed,
        "n_samples": args.n_samples,
    }
    if args.no_duplicate and has_record(args.db, guard):
        print("record already in DB; skipping (duplicate guard)")
        return

    if synthetic:
        spec, sched_spec = tiny_sd_spec(8), SchedulerSpec()
        text = CLIPTextEncoder(width=spec.cross_attention_dim, layers=2, heads=2)
    else:
        spec, sched_spec = MINISD_UNET, MINISD_SCHEDULER
        text = CLIPTextEncoder()
    model = UNet2D(spec)
    size, ch = spec.sample_size, spec.in_channels
    base_params = sd_base_params(args, model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, size, size, ch)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.cross_attention_dim)),
    )["params"])
    text_params, tokenize = sd_text_params(args, text)
    prompt = PROMPTS_ARTBENCH.get(args.cls, f"a painting, {args.cls}")
    ehs = jnp.asarray(
        text.apply({"params": text_params}, jnp.asarray(tokenize([prompt])))
    )

    subset_params = lora_merge(base_params, _load_lora_npz(args.lora_dir))
    ref_params = (
        lora_merge(base_params, _load_lora_npz(args.reference_lora_dir))
        if args.reference_lora_dir
        else base_params
    )

    schedule = make_schedule(sched_spec)
    shape = (args.n_samples, size, size, ch)
    ehs_b = jnp.broadcast_to(ehs, (args.n_samples,) + ehs.shape[1:])

    # SD diffuses KL-VAE latents: generate RAW latents, decode to pixels for
    # every image metric (the reference decodes through the pipeline's VAE,
    # compute_model_behaviors.py:310-433), and keep the latents for the
    # diffusion-loss behavior.
    if synthetic:
        # Inverse of the trainer's fake channel-mean encode.
        def decode(z):
            return jnp.repeat(jnp.mean(z, axis=-1, keepdims=True), 3, axis=-1)
    else:
        from ..config.registry import MINISD_VAE
        from ..models.vqvae import load_sd_vae

        vae, vae_vars = load_sd_vae(MINISD_VAE, args.vae_weights)

        def decode(z):
            return vae.apply(vae_vars, z, method=vae.decode)

    @jax.jit
    def generate(params, key):
        lat = sample_loop(
            model.apply, params, schedule, sched_spec, shape, key,
            num_inference_steps=args.num_inference_steps, kind="ddim",
            encoder_hidden_states=ehs_b, postprocess=False,
        )
        return lat, jnp.clip(decode(lat) / 2.0 + 0.5, 0.0, 1.0)

    times = {}
    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    lat_ref, imgs_ref = generate(ref_params, key)
    lat_sub, imgs_sub = generate(subset_params, key)  # SAME key: paired generation
    jax.block_until_ready(imgs_sub)
    times["generation"] = time.time() - t0

    t0 = time.time()
    ssims = np.asarray(ssim(imgs_ref, imgs_sub))
    nrmses = np.asarray(nrmse(imgs_ref, imgs_sub))
    times["ssim_nrmse"] = time.time() - t0

    # CLIP similarity / prompt score / aesthetic on the (possibly latent)
    # outputs; real runs decode latents through the VAE first.
    t0 = time.time()
    vis, vis_vars = load_clip_vision(args.clip_weights, tiny=synthetic)
    embed = make_embed_fn(vis, vis_vars)
    rgb_ref = np.asarray(imgs_ref)[..., :3]
    rgb_sub = np.asarray(imgs_sub)[..., :3]
    emb_ref = embed(rgb_ref)
    emb_sub = embed(rgb_sub)

    def _norm(e):
        return e / np.maximum(np.linalg.norm(e, axis=1, keepdims=True), 1e-12)

    clip_sims = (_norm(emb_ref) * _norm(emb_sub)).sum(axis=1)
    # Prompt score: cosine between image emb and text emb (needs a paired
    # text projection; with random towers this is a smoke value).
    txt_emb = np.asarray(ehs[:, 0, : emb_sub.shape[1]])
    if txt_emb.shape[1] == emb_sub.shape[1]:
        clip_prompt = (_norm(emb_sub) * _norm(txt_emb)).sum(axis=1)
    else:
        clip_prompt = np.zeros(len(emb_sub))
    from ..models.clip_vision import load_aesthetic_head

    aest, aest_vars = load_aesthetic_head(
        args.aesthetic_weights, dim=emb_sub.shape[1]
    )
    aesthetic = np.asarray(aest.apply(aest_vars, jnp.asarray(emb_sub)))
    times["clip_aesthetic"] = time.time() - t0

    # Diffusion loss of the subset model on the reference generations — in
    # latent space, directly on the sampled latents (the reference re-encodes
    # decoded images; the raw latents are the same thing without the VAE
    # round-trip error).
    t0 = time.time()
    x = lat_ref

    @jax.jit
    def diff_loss(params, key):
        k_t, k_n = jax.random.split(key)
        t = jax.random.randint(k_t, (x.shape[0],), 0, sched_spec.num_train_timesteps)
        noise = jax.random.normal(k_n, x.shape)
        x_t = add_noise(schedule, x, noise, t)
        eps = model.apply({"params": params}, x_t, t, ehs_b)
        return jnp.mean((eps - noise) ** 2, axis=(1, 2, 3))

    losses = np.mean(
        [
            np.asarray(diff_loss(subset_params, jax.random.fold_in(key, 77 + i)))
            for i in range(args.n_noises)
        ],
        axis=0,
    )
    times["diffusion_loss"] = time.time() - t0

    def quantiles(v):
        return {
            "0.5": float(np.quantile(v, 0.5)),
            "0.75": float(np.quantile(v, 0.75)),
            "0.9": float(np.quantile(v, 0.9)),
            "avg": float(np.mean(v)),
        }

    per_image = {}
    for i in range(args.n_samples):
        per_image[f"generated_image_{i}_ssim"] = float(ssims[i])
        per_image[f"generated_image_{i}_nrmse"] = float(nrmses[i])
        per_image[f"generated_image_{i}_clip_similarity"] = float(clip_sims[i])
        per_image[f"generated_image_{i}_clip_prompt_score"] = float(clip_prompt[i])
        per_image[f"generated_image_{i}_aesthetic_score"] = float(aesthetic[i])
        per_image[f"generated_image_{i}_simple_loss"] = float(losses[i])

    # Removal indices from the sibling removal_idx.csv if present.
    removed_idx = []
    csv = os.path.join(os.path.dirname(args.lora_dir), "removal_idx.csv")
    if os.path.exists(csv):
        with open(csv) as f:
            removed_idx = [int(l) for l in f.read().split()[1:]]

    row = provenance_row(
        args,
        **per_image,
        **{f"ssim_{k}": v for k, v in quantiles(ssims).items()},
        **{f"nrmse_{k}": v for k, v in quantiles(nrmses).items()},
        **{f"clip_similarity_{k}": v for k, v in quantiles(clip_sims).items()},
        **{f"clip_prompt_score_{k}": v for k, v in quantiles(clip_prompt).items()},
        **{f"aesthetic_score_{k}": v for k, v in quantiles(aesthetic).items()},
        **{f"simple_loss_{k}": v for k, v in quantiles(losses).items()},
        removed_idx=removed_idx,
        metric_times=times,
    )
    append_record(args.db, row)
    print(
        f"ssim_avg={np.mean(ssims):.4f} aesthetic_avg={np.mean(aesthetic):.4f} "
        f"loss_avg={np.mean(losses):.5f} -> {args.db}"
    )


if __name__ == "__main__":
    main()
