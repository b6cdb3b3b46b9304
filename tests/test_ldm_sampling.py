"""LDM (VQ-latent) path end to end: train in latent space, decode at sampling.

The celeba-style workload diffuses VQ-VAE latents (reference
src/ddpm_config.py:462-483); sampled latents must pass through the frozen VQ
decoder before any pixel-space scoring (reference builds an LDMPipeline whose
vqvae.decode follows the denoise loop, src/diffusion_utils.py:253-276).
"""

import os

import numpy as np
import pytest

DATASET = "synthetic_64x16_ldm"  # 64 images, 16x16 pixels -> 4x4 VQ latents


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("ldm"))


@pytest.fixture(scope="module")
def full_dir(outdir):
    from group_attribution_for_diffusion_models_tpu.cli import main as train_main

    train_main.main([
        "--dataset", DATASET, "--method", "retrain", "--removal_dist", "full",
        "--outdir", outdir, "--training_steps", "3", "--log_freq", "2",
    ])
    d = os.path.join(outdir, DATASET, "retrain", "models", "full")
    assert os.path.isdir(d)
    return d


def test_latent_training_shapes(outdir, full_dir):
    # The precompute cache holds latents at the U-Net's (downsampled) size.
    cache = os.path.join(outdir, DATASET, "precomputed_emb", "vqvae_latents.npy")
    lat = np.load(cache)
    assert lat.shape == (64, 4, 4, 3)


def test_generate_samples_decodes_to_pixels(outdir, full_dir):
    from PIL import Image

    from group_attribution_for_diffusion_models_tpu.cli import generate_samples

    sample_dir = os.path.join(outdir, "samples")
    generate_samples.main([
        "--dataset", DATASET, "--load", full_dir, "--n_samples", "2",
        "--batch_size", "2", "--num_inference_steps", "3",
        "--sample_outdir", sample_dir, "--outdir", outdir,
    ])
    img = Image.open(os.path.join(sample_dir, "sample_000000.png"))
    assert img.size == (16, 16)  # decoded pixels, not 4x4 latents


def test_pipeline_facade_decodes(full_dir):
    from group_attribution_for_diffusion_models_tpu.pipelines import (
        load_ckpt_model,
    )

    pipe = load_ckpt_model(full_dir, DATASET)
    assert pipe.decode_fn is not None
    imgs = pipe.generate_images(2, batch_size=2, num_inference_steps=2)
    assert imgs.shape == (2, 16, 16, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0


def test_unlearn_local_behaviors_in_latent_space(outdir, full_dir):
    from group_attribution_for_diffusion_models_tpu.cli import unlearn
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    db = os.path.join(outdir, "unlearn_db.jsonl")
    unlearn.main([
        "--dataset", DATASET, "--method", "gd", "--load", full_dir,
        "--removal_dist", "shapley", "--removal_seed", "0",
        "--model_behavior", "local", "--training_steps", "2",
        "--n_samples", "2", "--num_inference_steps", "2",
        "--outdir", outdir, "--db", db,
    ])
    rows = list(read_records(db))
    assert len(rows) == 1
    assert 0.0 <= rows[0]["avg_ssim"] <= 1.0


def test_ensemble_trains_in_latent_space(outdir):
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    db = os.path.join(outdir, "ens_db.jsonl")
    train_ensemble.main([
        "--dataset", DATASET, "--method", "retrain",
        "--removal_dist", "shapley", "--seed_start", "0", "--num_seeds", "2",
        "--training_steps", "2", "--n_samples", "2",
        "--num_inference_steps", "2", "--eval_loss", "--eval_probe_size", "16",
        "--outdir", outdir, "--db", db,
    ])
    rows = list(read_records(db))
    assert len(rows) == 2


def test_unlearn_global_uses_diversity_entropy(outdir, full_dir):
    """celeba-style workloads score diversity entropy, not FID (reference
    unlearn.py:787-803)."""
    from group_attribution_for_diffusion_models_tpu.cli import unlearn
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    db = os.path.join(outdir, "unlearn_global_db.jsonl")
    unlearn.main([
        "--dataset", DATASET, "--method", "gd", "--load", full_dir,
        "--removal_dist", "shapley", "--removal_seed", "1",
        "--model_behavior", "global", "--training_steps", "2",
        "--n_samples", "4", "--num_inference_steps", "2",
        "--outdir", outdir, "--db", db,
    ])
    rows = list(read_records(db))
    assert len(rows) == 1
    assert "entropy" in rows[0] and "fid_value" not in rows[0]
    assert rows[0]["entropy"] >= 0.0


def test_grad_features_in_latent_space(outdir, full_dir, tmp_path):
    """TRAK features for LDM workloads run in the VQ latent space (both the
    train source, which encodes, and the generated source, which keeps raw
    unclipped latents)."""
    from group_attribution_for_diffusion_models_tpu.cli import grad_features

    save = str(tmp_path / "feats.npz")
    grad_features.main([
        "--dataset", DATASET, "--load", full_dir, "--source", "train",
        "--proj_dim", "16", "--num_timesteps", "2", "--batch_size", "16",
        "--max_examples", "16", "--outdir", outdir, "--save_path", save,
    ])
    grad_features.main([
        "--dataset", DATASET, "--load", full_dir, "--source", "generated",
        "--proj_dim", "16", "--num_timesteps", "2", "--batch_size", "4",
        "--n_samples", "4", "--num_inference_steps", "2",
        "--outdir", outdir, "--save_path", save,
    ])
    store = np.load(save)
    assert store["train_features"].shape == (16, 16)
    assert store["gen_features"].shape == (4, 16)
    assert np.isfinite(store["train_features"]).all()


def test_combined_ldm_cross_attention_training(tmp_path):
    """imagenette-style LDMTextToImage shape: VQ latents + cross-attention
    U-Net + per-class caption embeddings, in one trainer invocation."""
    from group_attribution_for_diffusion_models_tpu.cli import main as train_main

    out = str(tmp_path)
    train_main.main([
        "--dataset", "synthetic_64x16_ldm_cond", "--method", "retrain",
        "--removal_dist", "shapley", "--removal_seed", "0",
        "--outdir", out, "--training_steps", "2", "--log_freq", "1",
        "--random_text_encoder",
    ])
    d = os.path.join(out, "synthetic_64x16_ldm_cond", "retrain", "models",
                     "shapley", "shapley_seed=0")
    assert os.path.isdir(d)
    assert any(n.startswith("ckpt_") for n in os.listdir(d))


def test_train_vqvae_cli_produces_loadable_weights(tmp_path):
    """cli.train_vqvae trains a real (non-random) VQ-VAE whose weights every
    --vqvae_weights consumer loads; reconstruction improves over training."""
    import json
    import os

    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.cli import train_vqvae
    from group_attribution_for_diffusion_models_tpu.cli.common import config_for
    from group_attribution_for_diffusion_models_tpu.data import create_dataset
    from group_attribution_for_diffusion_models_tpu.models.vqvae import load_vqvae

    outdir = str(tmp_path)
    db = os.path.join(outdir, "db.jsonl")
    train_vqvae.main([
        "--dataset", "synthetic_64x8_ldm", "--outdir", outdir,
        "--training_steps", "30", "--batch_size", "16", "--log_freq", "10",
        "--db", db,
    ])
    weights = os.path.join(outdir, "synthetic_64x8_ldm", "vqvae", "vqvae_weights.npy")
    assert os.path.exists(weights)
    row = json.loads(open(db).read().strip().splitlines()[-1])

    cfg = config_for("synthetic_64x8_ldm")
    vqvae, variables = load_vqvae(cfg.vqvae, weights)
    ds = create_dataset("synthetic_64x8_ldm", train=True)
    x = jnp.asarray(ds.images[:8])
    recon = vqvae.apply(variables, x)
    trained_mse = float(jnp.mean((recon - x) ** 2))
    # Trained beats the deterministic random init.
    _, rand_vars = load_vqvae(cfg.vqvae, None, quiet=True)
    rand_mse = float(jnp.mean((vqvae.apply(rand_vars, x) - x) ** 2))
    assert trained_mse < rand_mse
    assert row["recon"] is not None
