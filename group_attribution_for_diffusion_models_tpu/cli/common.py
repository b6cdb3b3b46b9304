"""Shared CLI plumbing: experiment naming, removal setup, provenance rows.

The reference's directory-naming convention doubles as the experiment key
(SURVEY.md §5.6): ``outdir/<dataset>/<method>/models/<removal_dir>/`` with
``removal_dir = <dist>[_alpha=<a>]_seed=<seed>`` (reference
unconditional_generation/main.py:236-254). LDS scripts later filter JSONL
rows by these recorded args, so both the layout and the row keys are
preserved bit-for-bit.
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Dict, Optional, Tuple

import numpy as np

from ..config import constants
from ..data import sample_removal
from ..data.datasets import ArrayDataset


def config_for(dataset: str):
    """Workload config; synthetic_* datasets get a tiny smoke-test config."""
    from ..config.registry import (
        OptimizerSpec,
        SchedulerSpec,
        TrainSpec,
        UNetSpec,
        WorkloadConfig,
        get_config,
    )

    if not dataset.startswith("synthetic"):
        return get_config(dataset)
    from ..config.registry import VQVAESpec

    parts = dataset.split("_")
    size = 32
    if len(parts) > 1 and "x" in parts[1]:
        _, size = (int(v) for v in parts[1].split("x"))
    # "synthetic_<n>x<s>_ldm" exercises the VQ-latent (celeba-style) path;
    # "..._cond" the cross-attention (imagenette-style) path; combinable.
    ldm = "ldm" in parts
    cond = "cond" in parts
    vqvae = (
        VQVAESpec(
            sample_size=size, block_out_channels=(8, 16, 16),
            layers_per_block=1, num_vq_embeddings=32, norm_num_groups=4,
        )
        if ldm
        else None
    )
    unet_size = size // 4 if ldm else size
    budgets = {m: 10 for m in ("retrain", "prune_fine_tune", "ga", "gd", "esd")}
    # "..._big": a ~1M-param U-Net with self-attention. The tiny default
    # (8,16) net cannot memorize per-class structure (10 templates of
    # 32x32x3 = 30k values > its whole parameter count), which caps any
    # attribution-quality demo regardless of estimator; measured on
    # synthetic_*_tpl: removed-class probe loss 5x kept-class with this
    # arch vs no gap with the tiny one.
    big = "big" in parts
    return WorkloadConfig(
        dataset=dataset,
        image_size=size,
        unet=UNetSpec(
            sample_size=unet_size,
            block_out_channels=(32, 64) if big else (8, 16),
            down_block_types=(
                ("CrossAttnDownBlock2D", "DownBlock2D")
                if cond
                else (
                    ("DownBlock2D", "AttnDownBlock2D")
                    if big
                    else ("DownBlock2D", "DownBlock2D")
                )
            ),
            up_block_types=(
                ("UpBlock2D", "CrossAttnUpBlock2D")
                if cond
                else (
                    ("AttnUpBlock2D", "UpBlock2D")
                    if big
                    else ("UpBlock2D", "UpBlock2D")
                )
            ),
            layers_per_block=2 if big else 1,
            norm_num_groups=8 if big else 4,
            attention_head_dim=2 if cond else None,
            cross_attention_dim=32 if cond else None,
        ),
        scheduler=SchedulerSpec(),
        train=TrainSpec(
            batch_size=8,
            optimizer=OptimizerSpec(name="adam", lr=1e-3),
            training_steps=budgets,
            ckpt_freq={m: 10 for m in budgets},
            sample_freq={m: 100 for m in budgets},
            n_samples=4,
        ),
        vqvae=vqvae,
    )


def removal_dir_name(
    removal_dist: str,
    removal_seed: int = 0,
    datamodel_alpha: Optional[float] = None,
) -> str:
    """`full`, or `<dist>/<dist>[_alpha=<a>]_seed=<seed>`."""
    if removal_dist == "full":
        return "full"
    if removal_dist == "datamodel" and datamodel_alpha is not None:
        leaf = f"{removal_dist}_alpha={datamodel_alpha}_seed={removal_seed}"
    else:
        leaf = f"{removal_dist}_seed={removal_seed}"
    return os.path.join(removal_dist, leaf)


def model_output_dir(
    outdir: str,
    dataset: str,
    method: str,
    removal_dist: str,
    removal_seed: int = 0,
    datamodel_alpha: Optional[float] = None,
) -> str:
    return os.path.join(
        outdir,
        dataset,
        method,
        "models",
        removal_dir_name(removal_dist, removal_seed, datamodel_alpha),
    )


def add_common_args(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--dataset", type=str, required=True,
                        help="dataset name (incl. synthetic_* for smoke runs)")
    parser.add_argument("--outdir", type=str, default=constants.OUTDIR)
    parser.add_argument("--db", type=str, default=None,
                        help="JSONL results database path")
    parser.add_argument("--exp_name", type=str, default=None)
    parser.add_argument("--opt_seed", type=int, default=42,
                        help="seed for model init / training randomness")
    parser.add_argument("--removal_dist", type=str, default="full",
                        choices=constants.REMOVAL_DIST)
    parser.add_argument("--removal_seed", type=int, default=0)
    parser.add_argument("--datamodel_alpha", type=float, default=0.5)
    parser.add_argument("--removal_idx", type=int, default=None,
                        help="index for loo/aoi removal")
    parser.add_argument("--by_class", action="store_true", default=False)
    parser.add_argument("--num_inference_steps", type=int, default=100)
    parser.add_argument(
        "--vqvae_weights", type=str, default=None,
        help="converted VQ-VAE params (.npy) for latent workloads",
    )
    parser.add_argument(
        "--tracker", type=str, default="none",
        choices=["none", "jsonl", "wandb", "tensorboard"],
        help="training-scalar tracker (reference main.py:604-616 wandb opt)",
    )
    parser.add_argument(
        "--profile_dir", type=str, default=None,
        help="write a jax.profiler trace of the training loop here "
             "(inspect with TensorBoard/XProf)",
    )


def tracker_for(args, run_name: str):
    """Scalar tracker from common CLI args (logs land under <outdir>/logs)."""
    from ..utils.trackers import make_tracker

    return make_tracker(
        args.tracker,
        run_name=run_name,
        config={k: v for k, v in vars(args).items()
                if isinstance(v, (int, float, str, bool, type(None)))},
        logdir=os.path.join(args.outdir, "logs"),
    )


def vq_decode_fn_for(cfg, vqvae_weights: Optional[str] = None, quiet: bool = False):
    """decode_fn for LDM workloads (None for pixel-space ones).

    Passed to the samplers so the frozen VQ decoder renders U-Net latents to
    pixels inside the compiled sampling program (reference builds an
    LDMPipeline whose vqvae.decode follows the denoise loop,
    src/diffusion_utils.py:253-276)."""
    if cfg.vqvae is None:
        return None
    from ..models.vqvae import make_vq_decode_fn

    return make_vq_decode_fn(cfg.vqvae, vqvae_weights, quiet=quiet)


def add_sd_pretrained_args(parser: argparse.ArgumentParser) -> None:
    """Pretrained-weight entry points for the text-to-image CLIs.

    The reference's SD path always starts from the pretrained miniSD tower
    (`--pretrained_model_name_or_path`, train_text_to_image_lora.py:719-744);
    here the converted equivalents are opt-in flags so the same CLIs cover
    both zero-egress smoke runs (random towers) and real checkpoints."""
    parser.add_argument("--unet_ckpt", type=str, default=None,
                        help="framework checkpoint dir with the pretrained "
                             "base U-Net (from cli.convert_weights unet)")
    parser.add_argument("--text_encoder_weights", type=str, default=None,
                        help="converted CLIP text params (.npz from "
                             "cli.convert_weights clip_text, or a torch "
                             "state-dict file)")
    parser.add_argument("--tokenizer_dir", type=str, default=None,
                        help="dir with CLIP vocab.json + merges.txt "
                             "(required with --text_encoder_weights)")


def validated_text_params(text, weights_path: str, loader=None):
    """Load converted text-encoder params, failing loudly on a tower mismatch.

    `loader` defaults to the CLIP text loader; the imagenette LDMBert path
    passes models.ldm_bert.load_ldm_bert."""
    import jax
    import jax.numpy as jnp

    if loader is None:
        from ..models.clip_text import load_clip_text as loader

    params = loader(weights_path)
    probe = jax.eval_shape(
        lambda: text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    )["params"]

    def _flat_shapes(tree):
        return {
            "/".join(k.key for k in p): tuple(l.shape)
            for p, l in jax.tree_util.tree_flatten_with_path(tree)[0]
        }

    want, got = _flat_shapes(probe), _flat_shapes(params)
    if want != got:
        diff = sorted(set(want.items()) ^ set(got.items()))[:8]
        width = getattr(text, "width", None) or getattr(text, "d_model", "?")
        raise SystemExit(
            f"--text_encoder_weights does not match the {width}-wide "
            f"{type(text).__name__} text tower; first mismatches: {diff}"
        )
    return params


def sd_text_params(args, text):
    """(text_params, tokenize) honoring the pretrained flags.

    Real weights require the real BPE vocab — hash-tokenized ids would index
    the pretrained embedding table arbitrarily."""
    import jax
    import jax.numpy as jnp

    from ..models.clip_text import load_tokenizer

    if args.text_encoder_weights:
        if not args.tokenizer_dir:
            raise SystemExit(
                "--text_encoder_weights needs --tokenizer_dir "
                "(vocab.json + merges.txt): hash-tokenized prompts would "
                "index the real embedding table with arbitrary ids"
            )
        params = validated_text_params(text, args.text_encoder_weights)
        print(f"loaded text encoder weights from {args.text_encoder_weights}")
    else:
        params = text.init(
            jax.random.PRNGKey(1), jnp.zeros((1, 77), jnp.int32)
        )["params"]
    return params, load_tokenizer(args.tokenizer_dir)


def sd_base_params(args, init_params):
    """Base U-Net params: the converted pretrained checkpoint when given
    (reference loads miniSD's UNet2DConditionModel), else the random init."""
    if not getattr(args, "unet_ckpt", None):
        return init_params
    from ..training import TrainState, make_optimizer
    from ..utils.ckpt import load_checkpoint

    state, _ = load_checkpoint(
        args.unet_ckpt,
        TrainState.create(init_params, make_optimizer("adam", lr=1e-4)),
    )
    print(f"loaded base U-Net from {args.unet_ckpt}")
    return state.params


def setup_removal(
    args, dataset: ArrayDataset
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample the removal split for this job from the CLI args."""
    if args.removal_dist == "full":
        return np.arange(len(dataset)), np.array([], dtype=np.int64)
    target = dataset.labels if args.by_class else len(dataset)
    return sample_removal(
        args.removal_dist,
        target,
        seed=args.removal_seed,
        alpha=args.datamodel_alpha,
        by_class=args.by_class,
        idx=args.removal_idx,
    )


def provenance_row(args, **extra) -> Dict:
    """vars(args) + extras: the JSONL row schema LDS keys on (SURVEY.md §5.5)."""
    row = {k: v for k, v in vars(args).items()}
    row["timestamp"] = time.time()
    row.update(extra)
    return row


def save_removal_indices(model_dir: str, remaining, removed) -> None:
    os.makedirs(model_dir, exist_ok=True)
    np.save(os.path.join(model_dir, "remaining_idx.npy"), np.asarray(remaining))
    np.save(os.path.join(model_dir, "removed_idx.npy"), np.asarray(removed))
