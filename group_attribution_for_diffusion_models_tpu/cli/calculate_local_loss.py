"""Per-inference-timestep local behaviors between full and removal model.

CLI mirror of reference unconditional_generation/calculate_local_loss.py
:253-653 (which the reference left unfinished with a live ipdb breakpoint,
SURVEY.md §7 quirks): run paired DDIM trajectories from the same keys,
decode each intermediate latent to an image estimate (x0-hat), and record
MSE/SSIM between the full-model and removal-model estimates at EVERY
inference timestep — a time-resolved view of where the subset model
diverges. Appends one JSONL row with per-step arrays.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..diffusion import make_schedule, pred_original_sample
from ..diffusion.sampling import sample_with_trajectory
from ..models import UNet2D
from ..training import TrainState, make_optimizer
from ..utils import append_record
from ..utils.ckpt import load_checkpoint, load_unet_spec
from ..utils.image_metrics import mse, ssim
from .common import add_common_args, config_for, provenance_row, vq_decode_fn_for


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--full_model_dir", type=str, required=True)
    parser.add_argument("--removal_model_dir", type=str, required=True)
    parser.add_argument("--n_samples", type=int, default=8)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args(argv)


def _load(model_dir, cfg):
    import jax
    import jax.numpy as jnp

    spec = cfg.unet
    model = UNet2D(spec)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels)),
        jnp.zeros((1,), jnp.int32),
    )["params"]
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
    schedule = make_schedule(cfg.scheduler)
    shape = (args.n_samples, spec.sample_size, spec.sample_size, spec.in_channels)
    key = jax.random.PRNGKey(args.seed)

    full_model, full_state, _ = _load(args.full_model_dir, cfg)
    rem_model, rem_state, rem_meta = _load(args.removal_model_dir, cfg)

    _, traj_full, ts = sample_with_trajectory(
        full_model.apply, full_state.ema_params, schedule, cfg.scheduler,
        shape, key, num_inference_steps=args.num_inference_steps,
    )
    _, traj_rem, _ = sample_with_trajectory(
        rem_model.apply, rem_state.ema_params, schedule, cfg.scheduler,
        shape, key, num_inference_steps=args.num_inference_steps,
    )

    # For LDM workloads each x0-hat is a VQ latent; decode it to pixels
    # before the image metrics (the reference's intermediate decodes,
    # calculate_local_loss.py:581-629).
    decode_fn = vq_decode_fn_for(cfg, args.vqvae_weights)

    @jax.jit
    def step_metrics(x_full, x_rem, t_scalar):
        t_b = jnp.full((shape[0],), t_scalar, jnp.int32)
        eps_f = full_model.apply({"params": full_state.ema_params}, x_full, t_b)
        eps_r = rem_model.apply({"params": rem_state.ema_params}, x_rem, t_b)
        x0_f = pred_original_sample(schedule, eps_f, t_b, x_full)
        x0_r = pred_original_sample(schedule, eps_r, t_b, x_rem)
        if decode_fn is not None:
            x0_f, x0_r = decode_fn(x0_f), decode_fn(x0_r)
        x0_f = jnp.clip(x0_f / 2 + 0.5, 0, 1)
        x0_r = jnp.clip(x0_r / 2 + 0.5, 0, 1)
        return jnp.mean(mse(x0_f, x0_r)), jnp.mean(ssim(x0_f, x0_r))

    per_step_mse, per_step_ssim = [], []
    for i, t in enumerate(np.asarray(ts)):
        m, s = step_metrics(traj_full[i], traj_rem[i], int(t))
        per_step_mse.append(float(m))
        per_step_ssim.append(float(s))
        print(f"t={int(t)} mse={float(m):.5f} ssim={float(s):.4f}", flush=True)

    db = args.db or os.path.join(args.outdir, f"{args.dataset}_local_loss_db.jsonl")
    append_record(
        db,
        provenance_row(
            args,
            remaining_idx=rem_meta.get("remaining_idx", []),
            removed_idx=rem_meta.get("removed_idx", []),
            timesteps=np.asarray(ts),
            per_step_mse=per_step_mse,
            per_step_ssim=per_step_ssim,
        ),
    )
    print(f"per-timestep behaviors -> {db}")


if __name__ == "__main__":
    main()
