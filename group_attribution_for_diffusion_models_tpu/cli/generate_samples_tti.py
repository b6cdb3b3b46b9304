"""Prompt-conditioned sample generation from a (LoRA-adapted) SD model.

CLI mirror of reference text_to_image/generate_samples.py: generate images
per ArtBench style prompt, checkpointing completion state so interrupted
generation resumes deterministically (the reference saves torch generator
state + completed labels, reference :130-194; here keys derive from
(seed, style, batch), so resume = skip completed batches).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..config.registry import (
    MINISD_SCHEDULER,
    MINISD_UNET,
    PROMPTS_ARTBENCH,
    SchedulerSpec,
)
from ..diffusion import make_schedule
from ..diffusion.sampling import sample_loop
from ..models import UNet2D
from ..models.clip_text import CLIPTextEncoder
from ..models.lora import lora_merge
from .common import add_sd_pretrained_args, sd_base_params, sd_text_params
from .train_text_to_image_lora import _load_lora_npz, tiny_sd_spec


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--dataset", type=str, default="artbench")
    parser.add_argument("--styles", type=str, nargs="+",
                        default=["post_impressionism"])
    parser.add_argument("--lora_dir", type=str, default=None)
    parser.add_argument("--n_samples_per_style", type=int, default=16)
    parser.add_argument("--batch_size", type=int, default=8)
    parser.add_argument("--num_inference_steps", type=int, default=100)
    parser.add_argument("--sample_outdir", type=str, required=True)
    parser.add_argument("--seed", type=int, default=42)
    parser.add_argument("--ckpt_freq", type=int, default=1,
                        help="batches between progress-state saves")
    add_sd_pretrained_args(parser)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    args = parse_args(argv)
    synthetic = args.dataset.startswith("synthetic")
    if synthetic:
        spec, sched_spec = tiny_sd_spec(8), SchedulerSpec()
        text = CLIPTextEncoder(width=spec.cross_attention_dim, layers=2, heads=2)
    else:
        spec, sched_spec = MINISD_UNET, MINISD_SCHEDULER
        text = CLIPTextEncoder()
    model = UNet2D(spec)
    size, ch = spec.sample_size, spec.in_channels
    params = sd_base_params(args, model.init(
        jax.random.PRNGKey(args.seed),
        jnp.zeros((1, size, size, ch)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 77, spec.cross_attention_dim)),
    )["params"])
    if args.lora_dir:
        params = lora_merge(params, _load_lora_npz(args.lora_dir))
    text_params, tokenize = sd_text_params(args, text)
    schedule = make_schedule(sched_spec)

    os.makedirs(args.sample_outdir, exist_ok=True)
    state_path = os.path.join(args.sample_outdir, "generation_state.json")
    done = set()
    if os.path.exists(state_path):
        with open(state_path) as f:
            done = {tuple(x) for x in json.load(f)["done"]}
        print(f"resuming: {len(done)} (style, batch) units complete")

    batch = min(args.batch_size, args.n_samples_per_style)
    shape = (batch, size, size, ch)

    @jax.jit
    def generate(ehs, key):
        return sample_loop(
            model.apply, params, schedule, sched_spec, shape, key,
            num_inference_steps=args.num_inference_steps, kind="ddim",
            encoder_hidden_states=ehs,
        )

    n_batches = -(-args.n_samples_per_style // batch)
    for style in args.styles:
        prompt = PROMPTS_ARTBENCH.get(style, f"a painting, {style}")
        ehs = jnp.asarray(
            text.apply({"params": text_params}, jnp.asarray(tokenize([prompt])))
        )
        ehs_b = jnp.broadcast_to(ehs, (batch,) + ehs.shape[1:])
        style_dir = os.path.join(args.sample_outdir, style)
        os.makedirs(style_dir, exist_ok=True)
        for b in range(n_batches):
            if (style, b) in done:
                continue
            key = jax.random.fold_in(
                jax.random.fold_in(jax.random.PRNGKey(args.seed), hash(style) % 2**31),
                b,
            )
            imgs = np.asarray(generate(ehs_b, key))
            u8 = (imgs[..., :3] * 255).round().astype(np.uint8)
            for i in range(len(u8)):
                idx = b * batch + i
                if idx >= args.n_samples_per_style:
                    break
                Image.fromarray(u8[i]).save(
                    os.path.join(style_dir, f"{style}_{idx:05d}.png")
                )
            done.add((style, b))
            if (b + 1) % args.ckpt_freq == 0 or b + 1 == n_batches:
                with open(state_path, "w") as f:
                    json.dump({"done": sorted(list(d) for d in done)}, f)
            print(f"{style}: batch {b + 1}/{n_batches}", flush=True)
    print(f"samples in {args.sample_outdir}")


if __name__ == "__main__":
    main()
