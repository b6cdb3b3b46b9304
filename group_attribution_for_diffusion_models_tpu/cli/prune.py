"""Structurally prune a trained U-Net checkpoint.

CLI mirror of reference unconditional_generation/prune.py:193-452, rebuilt as
a config transform: importance (magnitude / taylor / diff-pruning / random)
selects hidden channels, parameters are sliced, and the pruned architecture
is saved as spec + params in checkpoint metadata — main.py
--method prune_fine_tune picks it up from there.

Usage (smoke):
    python -m group_attribution_for_diffusion_models_tpu.cli.prune \
        --dataset synthetic_64x8 --load /tmp/out/.../models/full \
        --pruning_ratio 0.3 --pruner magnitude --outdir /tmp/out
"""

from __future__ import annotations

import argparse

import numpy as np

from ..data import create_dataset
from ..diffusion import make_schedule
from ..models import UNet2D
from ..pruning import (
    count_params,
    magnitude_importance,
    prune_unet,
    random_importance,
    taylor_importance,
)
from ..training import TrainState, make_optimizer
from ..utils.ckpt import load_checkpoint, save_checkpoint
from .common import add_common_args, config_for, model_output_dir


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_common_args(parser)
    parser.add_argument("--load", type=str, required=True,
                        help="model dir with the trained full-model ckpt")
    parser.add_argument("--pruning_ratio", type=float, default=0.3)
    parser.add_argument("--pruner", type=str, default="magnitude",
                        choices=["magnitude", "taylor", "diff-pruning", "random"])
    parser.add_argument("--thr", type=float, default=0.05,
                        help="diff-pruning loss threshold")
    parser.add_argument("--taylor_batch_size", type=int, default=64)
    parser.add_argument("--timestep_stride", type=int, default=1)
    return parser.parse_args(argv)


def main(argv=None):
    import jax
    import jax.numpy as jnp

    args = parse_args(argv)
    cfg = config_for(args.dataset)
    spec = cfg.unet
    model = UNet2D(spec)
    x0 = jnp.zeros((1, spec.sample_size, spec.sample_size, spec.in_channels))
    t0 = jnp.zeros((1,), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x0, t0)["params"]
    tx = make_optimizer(cfg.train.optimizer.name, lr=cfg.train.optimizer.lr)
    state, meta = load_checkpoint(args.load, TrainState.create(params, tx))
    params = state.params

    if args.pruner == "magnitude":
        importance = magnitude_importance(params)
    elif args.pruner == "random":
        importance = random_importance(params, seed=args.opt_seed)
    else:  # taylor / diff-pruning accumulate grads over timesteps
        dataset = create_dataset(args.dataset, train=True)
        schedule = make_schedule(cfg.scheduler)
        importance = taylor_importance(
            model.apply, params, schedule, dataset.images,
            num_timesteps=cfg.scheduler.num_train_timesteps,
            timestep_stride=args.timestep_stride,
            loss_threshold=args.thr if args.pruner == "diff-pruning" else None,
            seed=args.opt_seed,
            batch_size=args.taylor_batch_size,
        )

    n_before = count_params(params)
    new_spec, new_params = prune_unet(spec, params, args.pruning_ratio, importance)
    n_after = count_params(new_params)
    print(
        f"pruned {args.pruner} ratio={args.pruning_ratio}: "
        f"{n_before:,} -> {n_after:,} params ({n_after / n_before:.1%})"
    )

    out_dir = model_output_dir(args.outdir, args.dataset, "prune", "full")
    pruned_model = UNet2D(new_spec)
    pruned_params = jax.tree_util.tree_map(jnp.asarray, new_params)
    tx2 = make_optimizer(cfg.train.optimizer.name, lr=cfg.train.optimizer.lr)
    # Step 0 checkpoint, architecture in metadata (vs the reference's pickled
    # module, prune.py:415-421).
    save_checkpoint(
        out_dir, 0, TrainState.create(pruned_params, tx2), unet_spec=new_spec
    )
    # Smoke-test the pruned forward like the reference's test inference.
    out = pruned_model.apply({"params": pruned_params}, x0, t0)
    assert np.isfinite(np.asarray(out)).all()
    print(f"pruned model saved to {out_dir}")


if __name__ == "__main__":
    main()
