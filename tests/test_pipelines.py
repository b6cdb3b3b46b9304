"""Pipeline facade + journey-TRAK + profiling tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def test_pipeline_facade(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import main as train_main
    from group_attribution_for_diffusion_models_tpu.pipelines import (
        build_pipeline,
        load_ckpt_model,
    )

    outdir = str(tmp_path)
    train_main.main([
        "--dataset", "synthetic_64x8", "--method", "retrain",
        "--removal_dist", "full", "--outdir", outdir, "--training_steps", "2",
        "--db", os.path.join(outdir, "db.jsonl"),
    ])
    model_dir = os.path.join(outdir, "synthetic_64x8", "retrain", "models", "full")
    pipe = load_ckpt_model(model_dir, "synthetic_64x8")
    imgs = pipe.generate_images(3, seed=1, batch_size=2, num_inference_steps=2)
    assert imgs.shape == (3, 8, 8, 3)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0

    # No-checkpoint pipeline: random init still samples.
    pipe2 = build_pipeline("synthetic_64x8")
    imgs2 = pipe2.run_inference(n_samples=2, num_inference_steps=2)
    assert imgs2.shape == (2, 8, 8, 3)

    # Repeated same-geometry calls reuse one compiled sampler (no re-trace):
    # the subset-scoring loops call generate_images once per subset.
    assert len(pipe._samplers) == 1
    imgs3 = pipe.generate_images(3, seed=2, batch_size=2, num_inference_steps=2)
    assert len(pipe._samplers) == 1
    assert imgs3.shape == (3, 8, 8, 3)
    pipe.generate_images(2, seed=2, batch_size=2, num_inference_steps=3)
    assert len(pipe._samplers) == 2


def test_journey_trak_features():
    from group_attribution_for_diffusion_models_tpu.attributions.methods.trak import (
        make_journey_feature_fn,
    )
    from group_attribution_for_diffusion_models_tpu.config import (
        SchedulerSpec,
        UNetSpec,
    )
    from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
    from group_attribution_for_diffusion_models_tpu.diffusion.sampling import (
        sample_with_trajectory,
    )
    from group_attribution_for_diffusion_models_tpu.models import UNet2D

    spec = SchedulerSpec()
    tiny = UNetSpec(
        sample_size=8, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4,
    )
    model = UNet2D(tiny)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    schedule = make_schedule(spec)
    imgs, traj, ts = sample_with_trajectory(
        model.apply, params, schedule, spec, (2, 8, 8, 3),
        jax.random.PRNGKey(1), num_inference_steps=3,
    )
    assert traj.shape == (3, 2, 8, 8, 3)
    assert ts.shape == (3,)
    feat_fn = make_journey_feature_fn(
        model.apply, schedule, spec, proj_dim=128
    )
    feats = np.asarray(feat_fn(params, traj, ts, jax.random.PRNGKey(2)))
    assert feats.shape == (2, 128)
    assert np.isfinite(feats).all() and np.abs(feats).sum() > 0


def test_timings_and_trace(tmp_path):
    from group_attribution_for_diffusion_models_tpu.utils.profiling import (
        Timings,
        trace,
    )

    t = Timings()
    with t.section("a"):
        pass
    with t.section("a"):
        pass
    with t.section("b"):
        pass
    d = t.as_dict(prefix="x_")
    assert set(d) == {"x_a_time", "x_b_time"}
    with trace(None):  # no-op path
        pass


def test_load_tokenizer_real_vocab(tmp_path):
    """load_tokenizer uses a real CLIP BPE when vocab files exist locally
    (via transformers); the HashTokenizer only stands in without them."""
    import json

    from group_attribution_for_diffusion_models_tpu.models.clip_text import (
        HashTokenizer,
        load_tokenizer,
    )

    vocab = {"<|startoftext|>": 0, "<|endoftext|>": 1}
    for w in ("a</w>", "painting</w>", "by</w>"):
        vocab.setdefault(w, len(vocab))
    for ch in "abcdefghijklmnopqrstuvwxyz":
        vocab.setdefault(ch, len(vocab))
        vocab.setdefault(ch + "</w>", len(vocab))
    json.dump(vocab, open(tmp_path / "vocab.json", "w"))
    (tmp_path / "merges.txt").write_text("#version: 0.2\n")

    tokenize = load_tokenizer(str(tmp_path), max_length=12)
    assert not isinstance(tokenize, HashTokenizer)
    ids = tokenize(["a painting", "by"])
    assert ids.shape == (2, 12)
    assert ids[0, 0] == 0  # BOS
    # With no merges the BPE stays at character level: 'a' -> a</w> = 2.
    assert ids[0, 1] == vocab["a</w>"]
    assert ids[1, -1] == 1  # EOS padding
    # An explicitly requested vocab dir must load — silently substituting
    # the hash tokenizer would feed arbitrary ids to real embeddings.
    with pytest.raises(OSError):
        load_tokenizer(str(tmp_path / "nope"))
    # Only the no-vocab case stands in with the deterministic hash tokenizer.
    assert isinstance(load_tokenizer(None), HashTokenizer)
