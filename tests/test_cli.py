"""End-to-end CLI pipeline test: train -> prune -> sparse-FT -> local scores
-> ensemble -> attribute -> lds, all on synthetic data (SURVEY.md §4)."""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'

from group_attribution_for_diffusion_models_tpu.utils import read_records


@pytest.fixture(scope="module")
def outdir(tmp_path_factory):
    return str(tmp_path_factory.mktemp("cli"))


DATASET = "synthetic_64x8"


def test_full_pipeline(outdir):
    from group_attribution_for_diffusion_models_tpu.cli import (
        attribute,
        calculate_local_scores,
        lds,
        main as train_main,
        prune,
        train_ensemble,
    )

    db = os.path.join(outdir, "db.jsonl")

    # 1) full-model training
    train_main.main([
        "--dataset", DATASET, "--method", "retrain", "--removal_dist", "full",
        "--outdir", outdir, "--training_steps", "4", "--db", db, "--log_freq", "2",
    ])
    full_dir = os.path.join(outdir, DATASET, "retrain", "models", "full")
    assert os.path.isdir(full_dir)
    assert any(n.startswith("ckpt_steps_") for n in os.listdir(full_dir))

    # 2) prune the full model
    prune.main([
        "--dataset", DATASET, "--load", full_dir, "--pruning_ratio", "0.4",
        "--pruner", "magnitude", "--outdir", outdir,
    ])
    prune_dir = os.path.join(outdir, DATASET, "prune", "models", "full")
    assert os.path.isdir(prune_dir)

    # 3) sparse fine-tune on a shapley subset from the pruned model
    train_main.main([
        "--dataset", DATASET, "--method", "prune_fine_tune",
        "--removal_dist", "shapley", "--removal_seed", "0",
        "--pruned_model_dir", prune_dir,
        "--outdir", outdir, "--training_steps", "3", "--db", db,
    ])
    sft_dir = os.path.join(
        outdir, DATASET, "prune_fine_tune", "models", "shapley", "shapley_seed=0"
    )
    assert os.path.isdir(sft_dir)
    assert os.path.exists(os.path.join(sft_dir, "remaining_idx.npy"))

    # 4) paired local scores between full and subset model
    calculate_local_scores.main([
        "--dataset", DATASET, "--full_model_dir", full_dir,
        "--removal_model_dir", sft_dir, "--outdir", outdir, "--db", db,
        "--n_samples", "2", "--n_noises", "1", "--num_inference_steps", "3",
    ])
    rows = [r for r in read_records(db) if "avg_ssim" in r]
    assert rows and 0.0 <= rows[-1]["avg_ssim"] <= 1.0

    # 5) ensemble: 4 shapley subsets at once + 4 datamodel 'test' subsets
    train_ensemble.main([
        "--dataset", DATASET, "--removal_dist", "shapley", "--seed_start", "0",
        "--num_seeds", "4", "--training_steps", "2", "--outdir", outdir,
        "--db", db, "--batch_size", "8",
    ])
    train_ensemble.main([
        "--dataset", DATASET, "--removal_dist", "datamodel", "--seed_start", "42",
        "--num_seeds", "4", "--training_steps", "2", "--outdir", outdir,
        "--db", db, "--batch_size", "8",
    ])
    shapley_rows = [
        r for r in read_records(db)
        if r.get("removal_dist") == "shapley" and "loss" in r
    ]
    assert len(shapley_rows) >= 4

    # 6) closed-form attribution from the behavior DB
    attrs_path = os.path.join(outdir, "attrs.npy")
    attribute.main([
        "--dataset", DATASET, "--attribution_method", "shapley",
        "--train_db", db, "--model_behavior_key", "loss",
        "--save_path", attrs_path, "--outdir", outdir,
    ])
    attrs = np.load(attrs_path)
    assert attrs.shape == (64,)
    assert os.path.exists(os.path.join(outdir, "attrs_ranking.npy"))

    # 7) LDS evaluation against the datamodel rows
    lds.main([
        "--dataset", DATASET, "--removal_dist", "shapley", "--train_db", db,
        "--test_db", db, "--model_behavior_key", "loss", "--outdir", outdir,
        "--train_size_step", "4",
    ])


def test_trak_feature_store_attribution(outdir, tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import attribute

    rng = np.random.RandomState(0)
    store = str(tmp_path / "feats.npz")
    np.savez(
        store,
        train_features=rng.normal(size=(32, 16)),
        gen_features=rng.normal(size=(8, 16)),
        group_labels=np.repeat(np.arange(8), 4),
    )
    save = str(tmp_path / "trak_attrs.npy")
    attribute.main([
        "--dataset", DATASET, "--attribution_method", "trak",
        "--train_db", store, "--save_path", save, "--outdir", outdir,
    ])
    assert np.load(save).shape == (8,)


def test_shapley_pipeline_by_class(tmp_path):
    """One-command pipeline with class-level attribution units: masks
    collapse to classes (reference lds.py:223-229) and LDS is computed."""
    import json

    from group_attribution_for_diffusion_models_tpu.cli import shapley_pipeline

    out = str(tmp_path)
    shapley_pipeline.main([
        "--dataset", "synthetic_64x8_mix", "--by_class",
        "--num_fit_subsets", "6", "--num_test_subsets", "4",
        "--training_steps", "3", "--batch_size", "8",
        "--behavior", "eval_loss", "--chunk_size", "6",
        "--outdir", out,
    ])
    db = os.path.join(out, "synthetic_64x8_mix_pipeline_db.jsonl")
    rows = [json.loads(l) for l in open(db)]
    summary = rows[-1]
    assert "lds_mean" in summary and summary["num_fit_subsets"] == 6
    attrs = np.load(os.path.join(out, "shapley_pipeline_attrs.npy"))
    # Class-level units: one coefficient per class, not per image.
    assert attrs.shape[0] == 10


@pytest.mark.slow
def test_shapley_pipeline_fid_behavior(tmp_path):
    """--behavior fid_value: sampling + InceptionV3 scoring run INSIDE the
    ensemble loop (train_ensemble --score fid), every subset row carries a
    real fid_value, and the LDS fit consumes them. Uses the He-rescaled
    random tower (inception_v3.load_inception) whose features are
    signal-bearing without egress weights."""
    import json

    from group_attribution_for_diffusion_models_tpu.cli import shapley_pipeline

    out = str(tmp_path)
    shapley_pipeline.main([
        "--dataset", "synthetic_64x8_mix", "--by_class",
        "--fit_dist", "shapley_paired", "--removal_seed", "100",
        "--num_fit_subsets", "4", "--num_test_subsets", "3",
        "--training_steps", "2", "--batch_size", "8",
        "--behavior", "fid_value", "--n_samples", "8",
        "--num_inference_steps", "2", "--chunk_size", "4",
        "--outdir", out,
    ])
    db = os.path.join(out, "synthetic_64x8_mix_pipeline_db.jsonl")
    rows = [json.loads(l) for l in open(db)]
    scored = [r for r in rows if r.get("fid_value") is not None]
    # 4 fit + 3 test + 2 anchors.
    assert len(scored) == 9
    # The He-rescaled tower must produce non-degenerate FIDs (the default
    # init collapsed every FID to ~0, carrying no subset signal).
    fids = np.asarray([r["fid_value"] for r in scored])
    assert fids.std() > 1e-3 and np.isfinite(fids).all()
    assert "lds_mean" in rows[-1] and rows[-1]["behavior"] == "fid_value"
    # Ref-stats cache shared across chunked invocations.
    assert os.path.exists(os.path.join(out, "inception_ref_stats.pkl"))


def test_shapley_pipeline_sparse_ft_method(tmp_path):
    """--method prune_fine_tune --load: the paper's central comparison —
    sparse-FT fit subsets (fine-tuned from a shared pruned base, their own
    step budget) fitted against ground-truth RETRAIN test rows (reference
    shapley_lds.py:228-283). Fit rows must carry the method and the anchors
    must come from the method game, while test rows stay retrain."""
    import json

    from group_attribution_for_diffusion_models_tpu.cli import (
        main as train_main,
        prune,
        shapley_pipeline,
    )

    out = str(tmp_path)
    db = os.path.join(out, "synthetic_64x8_mix_pipeline_db.jsonl")
    # Full model -> pruned base.
    train_main.main([
        "--dataset", "synthetic_64x8_mix", "--method", "retrain",
        "--removal_dist", "full", "--outdir", out, "--db", db,
        "--training_steps", "2", "--batch_size", "8", "--sample_freq", "0",
    ])
    prune.main([
        "--dataset", "synthetic_64x8_mix",
        "--load", os.path.join(out, "synthetic_64x8_mix", "retrain",
                               "models", "full"),
        "--pruning_ratio", "0.25", "--pruner", "magnitude", "--outdir", out,
    ])
    pruned = os.path.join(out, "synthetic_64x8_mix", "prune", "models", "full")
    shapley_pipeline.main([
        "--dataset", "synthetic_64x8_mix", "--by_class",
        "--method", "prune_fine_tune", "--load", pruned,
        "--num_fit_subsets", "4", "--num_test_subsets", "3",
        "--training_steps", "3", "--fit_training_steps", "2",
        "--batch_size", "8", "--behavior", "eval_loss", "--chunk_size", "4",
        "--outdir", out, "--db", db,
    ])
    rows = [json.loads(l) for l in open(db)]
    summary = rows[-1]
    assert summary["method"] == "prune_fine_tune"
    assert summary["fit_training_steps"] == 2
    assert "lds_mean" in summary and "lds_pooled" in summary
    fit = [r for r in rows if r.get("removal_dist") == "shapley"
           and r.get("method") == "prune_fine_tune"]
    test = [r for r in rows if r.get("removal_dist") == "datamodel"]
    assert len(fit) == 4 and all(r["training_steps"] == 2 for r in fit)
    assert len(test) == 3 and all(r["method"] == "retrain" for r in test)
    # Method-game anchors: full rows exist for prune_fine_tune at 0 and
    # fit_training_steps.
    anchors = [r for r in rows if r.get("removal_dist") == "full"
               and r.get("method") == "prune_fine_tune"]
    assert {r["training_steps"] for r in anchors} >= {0, 2}


def test_main_scan_chunk_fast_path(tmp_path):
    """--scan_chunk: device-resident lax.scan training with host events
    (log/sample/ckpt) firing at their exact step boundaries."""
    from group_attribution_for_diffusion_models_tpu.cli import main as train_main

    out = str(tmp_path)
    db = os.path.join(out, "db.jsonl")
    train_main.main([
        "--dataset", "synthetic_64x8", "--method", "retrain",
        "--removal_dist", "shapley", "--removal_seed", "0",
        "--outdir", out, "--training_steps", "12", "--log_freq", "4",
        "--sample_freq", "6", "--scan_chunk", "5", "--db", db,
    ])
    model_dir = os.path.join(
        out, "synthetic_64x8", "retrain", "models", "shapley", "shapley_seed=0"
    )
    samples = sorted(os.listdir(os.path.join(model_dir, "samples")))
    assert samples == ["steps_00000006.png", "steps_00000012.png"]
    rows = list(read_records(db))
    assert len(rows) == 1 and np.isfinite(rows[0]["loss"])
    from group_attribution_for_diffusion_models_tpu.utils.ckpt import get_max_steps

    assert get_max_steps(model_dir) == 12


def test_pipeline_datamodel_fit_dist(tmp_path):
    """--fit_dist datamodel: matched-distribution ridge fit (seed-windowed
    so fit rows [removal_seed, +n) never collide with the datamodel test
    rows [test_seed_start, +n)), the protocol-consistent LDS estimator for
    games with size-dependent interactions (ROADMAP size-interaction
    finding)."""
    import json

    from group_attribution_for_diffusion_models_tpu.cli import shapley_pipeline

    out = str(tmp_path)
    shapley_pipeline.main([
        "--dataset", "synthetic_64x8_mix", "--by_class",
        "--fit_dist", "datamodel", "--removal_seed", "100",
        "--num_fit_subsets", "4", "--num_test_subsets", "3",
        "--training_steps", "2", "--batch_size", "8",
        "--behavior", "eval_loss", "--chunk_size", "4",
        "--outdir", out,
    ])
    db = os.path.join(out, "synthetic_64x8_mix_pipeline_db.jsonl")
    rows = [json.loads(l) for l in open(db)]
    summary = rows[-1]
    # Fit and test rows are both removal_dist=datamodel but live in
    # disjoint seed windows; the summary must count them separately.
    assert summary["num_fit_subsets"] == 4
    assert summary["num_test_subsets"] == 3
    seeds = {r["removal_seed"] for r in rows if r.get("removal_dist") == "datamodel"}
    assert {100, 101, 102, 103}.issubset(seeds) and {42, 43, 44}.issubset(seeds)
    # Overlapping windows must be rejected up front.
    with pytest.raises(SystemExit, match="overlap"):
        shapley_pipeline.main([
            "--dataset", "synthetic_64x8_mix", "--fit_dist", "datamodel",
            "--removal_seed", "40", "--num_fit_subsets", "8",
            "--num_test_subsets", "3", "--outdir", out,
        ])


def test_lds_full_null_db_anchors(tmp_path):
    """--full_db/--null_db anchor the Shapley efficiency constraint on
    measured full/null behaviors (reference lds.py:338-353); with a
    loss-like behavior this recovers near-perfect LDS where max/min anchors
    would corrupt the fit."""
    import json

    from group_attribution_for_diffusion_models_tpu.cli import lds

    rng = np.random.RandomState(0)
    d = 10
    attrs_true = -rng.rand(d)  # keeping any unit LOWERS the loss

    def rows(dist, n):
        out = []
        for _ in range(n):
            m = (rng.rand(d) > 0.5).astype(int)
            y = 2.0 + m @ attrs_true + rng.normal(scale=0.01)
            out.append({
                "dataset": "synthetic_10x8", "method": "retrain",
                "removal_dist": dist,
                "remaining_idx": np.flatnonzero(m).tolist(),
                "removed_idx": np.flatnonzero(m == 0).tolist(),
                "eval_loss": float(y),
            })
        return out

    db = str(tmp_path / "db.jsonl")
    with open(db, "w") as f:
        for r in rows("shapley", 40) + rows("datamodel", 20):
            f.write(json.dumps(r) + "\n")
    full_db = str(tmp_path / "full.jsonl")
    null_db = str(tmp_path / "null.jsonl")
    with open(full_db, "w") as f:
        f.write(json.dumps({"dataset": "synthetic_10x8",
                            "eval_loss": float(2.0 + attrs_true.sum())}) + "\n")
    with open(null_db, "w") as f:
        f.write(json.dumps({"dataset": "synthetic_10x8", "eval_loss": 2.0}) + "\n")

    lds.main([
        "--dataset", "synthetic_10x8", "--removal_dist", "shapley",
        "--train_db", db, "--test_db", db,
        "--model_behavior_key", "eval_loss", "--num_units", str(d),
        "--full_db", full_db, "--null_db", null_db,
        "--train_size_step", "40",
    ])


def test_sample_freq_in_training_hook(outdir):
    """--sample_freq saves EMA sample grids mid-training (reference
    main.py:773-788)."""
    from group_attribution_for_diffusion_models_tpu.cli import main as train_main

    d = os.path.join(outdir, "hook")
    train_main.main([
        "--dataset", DATASET, "--method", "retrain", "--removal_dist", "full",
        "--outdir", d, "--training_steps", "4", "--sample_freq", "2",
        "--n_inference_samples", "2",
        "--db", os.path.join(d, "db.jsonl"),
    ])
    samples = os.path.join(d, DATASET, "retrain", "models", "full", "samples")
    assert sorted(os.listdir(samples)) == [
        "steps_00000002.png", "steps_00000004.png",
    ]


def test_conditional_requires_text_encoder_weights(tmp_path):
    """Conditional datasets refuse to train with a silently-random text
    encoder; --random_text_encoder is the explicit smoke-mode opt-in, and
    mismatched weights fail loudly."""
    import pytest as _pytest

    from group_attribution_for_diffusion_models_tpu.cli import main as train_main
    from group_attribution_for_diffusion_models_tpu.cli.common import config_for

    cond = "synthetic_64x8_cond"
    assert config_for(cond).unet.conditional

    argv = [
        "--dataset", cond, "--method", "retrain", "--removal_dist", "full",
        "--outdir", str(tmp_path), "--training_steps", "2",
        "--db", str(tmp_path / "db.jsonl"),
    ]
    with _pytest.raises(SystemExit, match="text_encoder_weights"):
        train_main.main(argv)

    # Wrong-shaped weights are rejected with a mismatch message.
    bad = tmp_path / "bad_text.npz"
    np.savez(bad, **{"token_embedding/embedding": np.zeros((3, 4), np.float32)})
    with _pytest.raises(SystemExit, match="does not match"):
        train_main.main(argv + ["--text_encoder_weights", str(bad)])

    # Explicit random opt-in trains.
    train_main.main(argv + ["--random_text_encoder"])
    model_dir = os.path.join(
        str(tmp_path), cond, "retrain", "models", "full"
    )
    assert any(n.startswith("ckpt_steps_") for n in os.listdir(model_dir))

    # Correct-shaped weights: accepted, but only WITH a real tokenizer vocab
    # (hash-tokenized ids would index the real embedding table arbitrarily).
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.clip_text import (
        CLIPTextEncoder,
    )

    argv = argv + ["--text_encoder_kind", "clip"]  # CLIP-shaped weights below
    spec = config_for(cond).unet
    w = spec.cross_attention_dim
    text = CLIPTextEncoder(width=w, layers=12 if w >= 768 else 2,
                           heads=12 if w % 12 == 0 else max(w // 16, 1))
    params = text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    flat = {}

    def _rec(node, pre):
        for k, v in node.items():
            if isinstance(v, dict):
                _rec(v, pre + [k])
            else:
                flat["/".join(pre + [k])] = np.asarray(v)

    _rec(params["params"], [])
    good = tmp_path / "good_text.npz"
    np.savez(good, **flat)
    with _pytest.raises(SystemExit, match="tokenizer_dir"):
        train_main.main(argv + ["--text_encoder_weights", str(good)])

    from test_clip_tokenizer import _write_tiny_vocab

    vocab_dir = tmp_path / "vocab"
    _write_tiny_vocab(vocab_dir)
    train_main.main(argv + ["--text_encoder_weights", str(good),
                            "--tokenizer_dir", str(vocab_dir)])

def test_train_ensemble_zero_steps_is_null_model(tmp_path):
    """--training_steps 0 records the UNTRAINED null model (the pipeline's
    y_v0 anchor) — it must not silently fall back to the config budget,
    and the recorded eval band must follow --eval_t_min/--eval_t_max."""
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    db = str(tmp_path / "db.jsonl")
    train_ensemble.main([
        "--dataset", "synthetic_64x8", "--removal_dist", "full",
        "--num_seeds", "1", "--training_steps", "0", "--outdir",
        str(tmp_path), "--db", db, "--eval_loss",
        "--eval_t_min", "100", "--eval_t_max", "600",
    ])
    rows = list(read_records(db))
    assert len(rows) == 1 and rows[0]["training_steps"] == 0
    # An untrained eps-model on mid-band noise sits near the unit-variance
    # loss floor; a config-budget (10-step) run would already move it.
    assert rows[0]["eval_loss"] is not None

def test_train_ensemble_loads_pruned_spec(tmp_path):
    """--load with a PRUNED checkpoint must rebuild the U-Net from the spec
    stored in meta.json BEFORE the ensemble step compiles (the sFT path:
    reference unconditional_generation/main.py loads the pruned model for
    prune_fine_tune). Regression: the spec swap used to happen after
    EnsembleTrainer had already baked apply_fn into its compiled step."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble
    from group_attribution_for_diffusion_models_tpu.cli.common import config_for
    from group_attribution_for_diffusion_models_tpu.models.unet2d import UNet2D
    from group_attribution_for_diffusion_models_tpu.training import (
        TrainState, make_optimizer,
    )
    from group_attribution_for_diffusion_models_tpu.utils import read_records
    from group_attribution_for_diffusion_models_tpu.utils.ckpt import save_checkpoint

    cfg = config_for("synthetic_64x8")
    pruned = dataclasses.replace(
        cfg.unet,
        block_out_channels=tuple(c // 2 for c in cfg.unet.block_out_channels),
    )
    model = UNet2D(pruned)
    x0 = jnp.zeros((1, pruned.sample_size, pruned.sample_size,
                    pruned.in_channels))
    params = model.init(jax.random.PRNGKey(0), x0,
                        jnp.zeros((1,), jnp.int32))["params"]
    ckpt_dir = str(tmp_path / "pruned_model")
    save_checkpoint(ckpt_dir, 0,
                    TrainState.create(params, make_optimizer("adam", lr=1e-3)),
                    unet_spec=pruned)

    db = str(tmp_path / "db.jsonl")
    train_ensemble.main([
        "--dataset", "synthetic_64x8", "--num_seeds", "2",
        "--training_steps", "2", "--batch_size", "8",
        "--load", ckpt_dir, "--outdir", str(tmp_path), "--db", db,
        "--method", "prune_fine_tune",
    ])
    rows = list(read_records(db))
    assert len(rows) == 2
    assert all(r["method"] == "prune_fine_tune" for r in rows)


def test_no_save_ckpts_resume_keyed_on_alpha_and_eval_band(tmp_path, capsys):
    """ADVICE r2 (low): --no-save_ckpts DB-row resume must not let rows from a
    differently-configured sweep (other datamodel alpha / eval-t band) satisfy
    the completion check — that silently skipped retrains and broke downstream
    'missing subset values' lookups."""
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    outdir = str(tmp_path)
    db = os.path.join(outdir, "db.jsonl")
    base = [
        "--dataset", DATASET, "--removal_dist", "datamodel",
        "--seed_start", "0", "--num_seeds", "2", "--training_steps", "2",
        "--outdir", outdir, "--db", db, "--batch_size", "8",
        "--no-save_ckpts",
    ]
    train_ensemble.main(base + ["--datamodel_alpha", "0.5"])
    n0 = len(list(read_records(db)))
    assert n0 == 2

    # Same seeds, different alpha: must retrain (2 new rows), not skip.
    train_ensemble.main(base + ["--datamodel_alpha", "0.25"])
    assert len(list(read_records(db))) == n0 + 2

    # Same alpha again: now it must skip (idempotent resume still works).
    train_ensemble.main(base + ["--datamodel_alpha", "0.5"])
    assert len(list(read_records(db))) == n0 + 2

    # Different eval band: must retrain.
    train_ensemble.main(
        base + ["--datamodel_alpha", "0.5", "--eval_t_min", "100",
                "--eval_t_max", "200"]
    )
    assert len(list(read_records(db))) == n0 + 4


def test_conditional_ldm_bert_text_encoder(tmp_path):
    """The reference-faithful imagenette encoder: converted LDMBert weights +
    a BERT WordPiece vocab drive the conditional trainer end to end
    (reference src/diffusion_utils.py:215-223)."""
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.cli import main as train_main
    from group_attribution_for_diffusion_models_tpu.cli.common import config_for
    from group_attribution_for_diffusion_models_tpu.models.ldm_bert import (
        LDMBertEncoder,
    )

    cond = "synthetic_64x8_cond"
    w = config_for(cond).unet.cross_attention_dim
    text = LDMBertEncoder(
        d_model=w, layers=2, num_heads=8, head_dim=max(w // 8, 4),
        ffn_dim=w * 4,
    )
    params = text.init(jax.random.PRNGKey(0), jnp.zeros((1, 77), jnp.int32))
    flat = {}

    def _rec(node, pre):
        for k, v in node.items():
            if isinstance(v, dict):
                _rec(v, pre + [k])
            else:
                flat["/".join(pre + [k])] = np.asarray(v)

    _rec(params["params"], [])
    weights = tmp_path / "ldm_bert.npz"
    np.savez(weights, **flat)

    vocab_dir = tmp_path / "bert_vocab"
    vocab_dir.mkdir()
    (vocab_dir / "vocab.txt").write_text(
        "\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a", "photo", "of",
                   "class"]) + "\n"
    )

    train_main.main([
        "--dataset", cond, "--method", "retrain", "--removal_dist", "full",
        "--outdir", str(tmp_path), "--training_steps", "2",
        "--db", str(tmp_path / "db.jsonl"),
        "--text_encoder_kind", "ldm_bert",
        "--text_encoder_weights", str(weights),
        "--tokenizer_dir", str(vocab_dir),
    ])
    model_dir = os.path.join(str(tmp_path), cond, "retrain", "models", "full")
    assert any(n.startswith("ckpt_steps_") for n in os.listdir(model_dir))


def test_train_ensemble_eval_layout_invariant(tmp_path):
    """Behavior rows must not depend on the device-mesh layout.

    Regression for a real GSPMD anomaly the multi-chip full-pass dryrun
    caught: with BIT-IDENTICAL ema params, the eval loss computed by a
    vmapped forward over the ensemble-SHARDED state under GSPMD
    auto-partitioning differed by ~5e-4 relative from the unsharded value
    on the virtual CPU mesh (same anomaly class as the value_and_grad
    divergence fixed in parallel/ensemble.py). The eval and sampling paths
    now lower through explicit shard_map; sharded and unsharded runs must
    agree to float32 ULP level.
    """
    import numpy as np

    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    def run(sub, mesh_ensemble):
        out = tmp_path / sub
        train_ensemble.main([
            "--dataset", "synthetic_64x8", "--removal_dist", "shapley",
            "--seed_start", "0", "--num_seeds", "4",
            "--training_steps", "1", "--batch_size", "2",
            "--eval_loss", "--eval_probe_size", "8",
            "--n_samples", "2", "--num_inference_steps", "2",
            "--mesh_ensemble", str(mesh_ensemble), "--mesh_data", "1",
            "--no-save_ckpts", "--outdir", str(out),
        ])
        rows = sorted(
            read_records(str(out / "synthetic_64x8_train_db.jsonl")),
            key=lambda r: r["removal_seed"],
        )
        assert len(rows) == 4
        return rows

    rows_mesh = run("mesh", 4)      # one member per device via shard_map
    rows_plain = run("plain", 1)    # unsharded vmap on one device
    for a, b in zip(rows_mesh, rows_plain):
        np.testing.assert_allclose(a["loss"], b["loss"], rtol=1e-6)
        np.testing.assert_allclose(a["eval_loss"], b["eval_loss"], rtol=1e-6)
