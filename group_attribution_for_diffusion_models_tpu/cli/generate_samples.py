"""Generate image samples from a trained checkpoint into PNG directories.

CLI mirror of reference unconditional_generation/generate_samples.py (model
load :236-285, generation :307-357): batched DDIM sampling from the EMA
params into ``<outdir>/<dataset>/<method>/samples/...``, with RNG-state
checkpointing so interrupted generation resumes deterministically
(the reference checkpoints torch generator state,
text_to_image/generate_samples.py:130-194; here the PRNG key is derived from
(seed, batch_index), so resume = skip completed batches).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ..diffusion.sampling import make_sampler
from ..models import UNet2D
from ..training import TrainState, make_optimizer
from ..utils.ckpt import load_checkpoint, load_unet_spec
from .common import add_common_args, config_for, vq_decode_fn_for


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--load", type=str, required=True, help="model dir")
    parser.add_argument("--n_samples", type=int, default=64)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--sample_outdir", type=str, required=True)
    parser.add_argument("--use_ema", action="store_true", default=True)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp
    from PIL import Image

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    spec = cfg.unet
    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    params = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))["params"]
    tx = make_optimizer("adam", lr=1e-4)
    state, meta = load_checkpoint(args.load, TrainState.create(params, tx))
    loaded_spec = load_unet_spec(meta)
    if loaded_spec is not None and loaded_spec != spec:
        model = UNet2D(loaded_spec)
    gen_params = state.ema_params if args.use_ema else state.params

    os.makedirs(args.sample_outdir, exist_ok=True)
    progress_path = os.path.join(args.sample_outdir, "generation_state.json")
    done_batches = set()
    if os.path.exists(progress_path):
        with open(progress_path) as f:
            done_batches = set(json.load(f)["done_batches"])
        print(f"resuming: {len(done_batches)} batches already complete")

    batch = min(args.batch_size, args.n_samples)
    shape = (batch, spec.sample_size, spec.sample_size, spec.in_channels)
    sampler = make_sampler(
        model.apply, cfg.scheduler, shape,
        num_inference_steps=args.num_inference_steps, kind="ddim",
        decode_fn=vq_decode_fn_for(cfg, args.vqvae_weights),
    )

    n_batches = -(-args.n_samples // batch)
    for b in range(n_batches):
        if b in done_batches:
            continue
        key = jax.random.fold_in(jax.random.PRNGKey(args.seed), b)
        imgs = np.asarray(sampler(gen_params, key))
        u8 = (imgs * 255).round().astype(np.uint8)
        for i in range(len(u8)):
            idx = b * batch + i
            if idx >= args.n_samples:
                break
            arr = u8[i]
            if arr.shape[-1] == 1:
                arr = arr[..., 0]
            Image.fromarray(arr).save(
                os.path.join(args.sample_outdir, f"sample_{idx:06d}.png")
            )
        done_batches.add(b)
        with open(progress_path, "w") as f:
            json.dump({"done_batches": sorted(done_batches)}, f)
        print(f"batch {b + 1}/{n_batches} written", flush=True)
    print(f"samples in {args.sample_outdir}")


if __name__ == "__main__":
    main()
