"""Coverage for the remaining CLI surfaces: evaluate_fid, similarity
baselines, runtime report, empirical verification, experiments."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'
from PIL import Image

from group_attribution_for_diffusion_models_tpu.utils import append_record


def _write_images(path, n, seed, size=8):
    os.makedirs(path, exist_ok=True)
    rng = np.random.RandomState(seed)
    for i in range(n):
        Image.fromarray(
            rng.randint(0, 255, (size, size, 3), dtype=np.uint8)
        ).save(os.path.join(path, f"img_{i:03d}.png"))


def test_evaluate_fid_dirs(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import evaluate_fid

    gen, ref = str(tmp_path / "gen"), str(tmp_path / "ref")
    _write_images(gen, 6, seed=0)
    _write_images(ref, 6, seed=1)
    db = str(tmp_path / "db.jsonl")
    evaluate_fid.main([
        "--generated_dir", gen, "--reference_dir", ref, "--db", db,
        "--batch_size", "4",
    ])
    from group_attribution_for_diffusion_models_tpu.utils import read_records

    rows = list(read_records(db))
    assert len(rows) == 1 and np.isfinite(rows[0]["fid_value"])


def test_similarity_baseline_pixel(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import similarity_baselines

    gen = str(tmp_path / "gen")
    _write_images(gen, 4, seed=2)
    save = str(tmp_path / "pix.npy")
    similarity_baselines.main([
        "--dataset", "synthetic_64x8", "--baseline", "pixel",
        "--generated_dir", gen, "--save_path", save,
    ])
    attrs = np.load(save)
    assert attrs.shape == (10,)  # synthetic has 10 groups
    assert os.path.exists(str(tmp_path / "pix_ranking.npy"))


def test_runtime_report_and_verification(tmp_path, capsys):
    from group_attribution_for_diffusion_models_tpu.cli import (
        empirical_verification,
        runtime_report,
    )

    db = str(tmp_path / "db.jsonl")
    rng = np.random.RandomState(0)
    for s in range(8):
        v = float(rng.rand())
        append_record(db, {"method": "retrain", "removal_dist": "shapley",
                           "removal_seed": s, "fid_value": v,
                           "total_steps_time": 50.0, "sampling_time": 5.0})
        append_record(db, {"method": "gd", "removal_dist": "shapley",
                           "removal_seed": s, "fid_value": v + 0.01,
                           "total_steps_time": 5.0, "sampling_time": 5.0})
    runtime_report.main(["--db", db])
    out = capsys.readouterr().out
    assert "speedup_vs_retrain" in out
    empirical_verification.main([
        "--db", db, "--method", "gd", "--model_behavior_key", "fid_value",
    ])
    out = capsys.readouterr().out
    assert "pearson=" in out and "spearman=" in out


def test_verification_attribution_vectors(tmp_path, capsys):
    """--attributions: Shapley vector fit from the efficient method's rows
    correlates with the vector fit from retrain rows (notebook cell 4)."""
    from group_attribution_for_diffusion_models_tpu.cli import empirical_verification
    from group_attribution_for_diffusion_models_tpu.data import create_dataset
    from group_attribution_for_diffusion_models_tpu.data.removal import sample_removal

    labels = create_dataset("synthetic_64x8", train=True).labels
    db = str(tmp_path / "db.jsonl")
    true_attr = np.arange(10) * 0.1  # heterogeneous per-class effects
    for s in range(20):
        remaining, _ = sample_removal("shapley", labels, seed=s, by_class=True)
        kept = np.unique(np.asarray(labels)[remaining])
        v = float(true_attr[kept].sum())
        for method, eps in (("retrain", 0.0), ("gd", 0.002 * (s % 3))):
            append_record(db, {"method": method, "removal_dist": "shapley",
                               "removal_seed": s, "eval_loss": v + eps})
    empirical_verification.main([
        "--db", db, "--method", "gd", "--model_behavior_key", "eval_loss",
        "--attributions", "--dataset", "synthetic_64x8", "--by_class",
    ])
    out = capsys.readouterr().out
    assert "attribution vectors" in out
    pearson = float(out.split("attribution vectors")[1].split("pearson=")[1].split()[0])
    assert pearson > 0.95  # near-identical behaviors -> near-identical vectors


def test_experiments_generation(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import experiments

    cf = str(tmp_path / "cmd.txt")
    experiments.main([
        "gen-commands", "--dataset", "synthetic_64x8",
        "--removal_dist", "shapley", "--num_seeds", "10", "--chunk_size", "4",
        "--outdir", str(tmp_path), "--db", str(tmp_path / "db.jsonl"),
        "--command_file", cf,
    ])
    lines = [l for l in open(cf).read().splitlines() if l]
    assert len(lines) == 3  # ceil(10/4) ensemble invocations
    assert all("train_ensemble" in l for l in lines)

    retry = str(tmp_path / "retry.txt")
    experiments.main([
        "find-incomplete", "--dataset", "synthetic_64x8",
        "--removal_dist", "shapley", "--num_seeds", "3",
        "--outdir", str(tmp_path), "--db", str(tmp_path / "db.jsonl"),
        "--command_file", retry,
    ])
    assert len(open(retry).read().splitlines()) == 3


def test_package_main_lists_commands(capsys):
    from group_attribution_for_diffusion_models_tpu.__main__ import main

    assert main(["--help"]) == 0
    out = capsys.readouterr().out
    for name in ("train_ensemble", "shapley_pipeline", "shapley_groundtruth"):
        assert name in out
    assert main(["no_such_command"]) == 2


def test_similarity_baseline_clip(tmp_path):
    """CLIP-embedding similarity on the tiny random-init tower (the
    synthetic-dataset path of reference text_to_image/clip_similarity.py)."""
    from group_attribution_for_diffusion_models_tpu.cli import similarity_baselines

    gen = str(tmp_path / "gen")
    _write_images(gen, 3, seed=5, size=32)
    save = str(tmp_path / "clip.npy")
    similarity_baselines.main([
        "--dataset", "synthetic_64x8", "--baseline", "clip",
        "--generated_dir", gen, "--save_path", save, "--by", "avg",
        "--agg", "sum",
    ])
    attrs = np.load(save)
    assert attrs.shape == (10,) and np.all(np.isfinite(attrs))
    ranking = np.load(str(tmp_path / "clip_ranking.npy"))
    assert sorted(ranking.tolist()) == list(range(10))


def test_similarity_baseline_aesthetic(tmp_path):
    """Aesthetic-score baseline (reference aesthetic_score.py): per-train
    CLIP embed -> MLP head -> per-group max/mean, no generated dir needed."""
    from group_attribution_for_diffusion_models_tpu.cli import similarity_baselines

    save = str(tmp_path / "aes.npy")
    similarity_baselines.main([
        "--dataset", "synthetic_64x8", "--baseline", "aesthetic",
        "--save_path", save, "--by", "max", "--max_examples", "32",
    ])
    attrs = np.load(save)
    # 32 examples cover only the first groups of the 64x8 synthetic set;
    # every covered group gets a finite score.
    assert attrs.ndim == 1 and np.all(np.isfinite(attrs))
    assert os.path.exists(str(tmp_path / "aes_ranking.npy"))


def test_prune_lora_cli(tmp_path):
    """prune_lora CLI round trip: npz in -> pruned npz + info.csv out
    (reference text_to_image/prune_lora.py:62-217)."""
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.cli import prune_lora as cli
    from group_attribution_for_diffusion_models_tpu.cli.train_text_to_image_lora import (
        _load_lora_npz,
        _save_lora_npz,
    )
    from group_attribution_for_diffusion_models_tpu.models.lora import (
        lora_init,
        lora_num_params,
        lora_ranks,
    )

    params = {
        "attn": {
            "to_q": {"kernel": jnp.zeros((32, 32))},
            "to_k": {"kernel": jnp.zeros((32, 32))},
            "to_out": {"kernel": jnp.zeros((32, 16))},
        }
    }
    tree = lora_init(params, rank=8, key=jax.random.PRNGKey(0))
    # Give 'up' nonzero magnitudes so pair importances are heterogeneous.
    tree = {
        name: {"down": ab["down"],
               "up": ab["up"] + jax.random.normal(jax.random.PRNGKey(i), ab["up"].shape)}
        for i, (name, ab) in enumerate(tree.items())
    }
    src = str(tmp_path / "lora_weights.npz")
    _save_lora_npz(src, tree)
    dst = str(tmp_path / "pruned" / "lora_weights.npz")
    cli.main(["--lora_dir", src, "--pruning_ratio", "0.5",
              "--save_path", dst])

    pruned = _load_lora_npz(dst)
    n_before, n_after = lora_num_params(tree), lora_num_params(pruned)
    assert n_after <= 0.55 * n_before
    assert all(r >= 1 for r in lora_ranks(pruned).values())
    info = open(str(tmp_path / "pruned" / "info.csv")).read().splitlines()
    assert info[0].startswith("params_before")
    vals = info[1].split(",")
    assert int(vals[0]) == n_before and int(vals[1]) == n_after


def test_experiments_run_roundtrip(tmp_path, monkeypatch, capsys):
    """gen-commands -> run (real subprocess training) -> find-incomplete
    reports a complete sweep: the full reference find_incomplete_trainings.py
    / run.sh loop on a tmpdir."""
    import subprocess
    import sys as _sys

    from group_attribution_for_diffusion_models_tpu.cli import experiments

    outdir, db = str(tmp_path), str(tmp_path / "db.jsonl")
    cf = str(tmp_path / "cmd.txt")
    experiments.main([
        "gen-commands", "--dataset", "synthetic_64x8",
        "--removal_dist", "shapley", "--num_seeds", "2", "--chunk_size", "2",
        "--training_steps", "2", "--outdir", outdir, "--db", db,
        "--command_file", cf,
    ])
    lines = [l for l in open(cf).read().splitlines() if l]
    assert len(lines) == 1 and "--training_steps 2" in lines[0]

    # find-incomplete BEFORE running: both seeds missing.
    retry = str(tmp_path / "retry.txt")
    experiments.main([
        "find-incomplete", "--dataset", "synthetic_64x8",
        "--removal_dist", "shapley", "--num_seeds", "2",
        "--outdir", outdir, "--db", db, "--command_file", retry,
    ])
    assert len(open(retry).read().splitlines()) == 2

    # `run` executes the command file via the shell. Force the subprocess
    # onto the CPU backend (sitecustomize would otherwise grab the TPU) and
    # keep the train tiny. repo-root cwd resolves `python -m <pkg>`.
    monkeypatch.setenv("PYTHONPATH", "")
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    monkeypatch.setenv("XLA_FLAGS", "")
    monkeypatch.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # Rewrite 'python' to the running interpreter for hermeticity.
    with open(cf) as f:
        cmds = f.read().replace("python -m", f"{_sys.executable} -m")
    with open(cf, "w") as f:
        f.write(cmds + "\n")
    experiments.main(["run", "--command_file", cf])

    # find-incomplete AFTER: sweep complete, no retry file rewritten.
    os.remove(retry)
    experiments.main([
        "find-incomplete", "--dataset", "synthetic_64x8",
        "--removal_dist", "shapley", "--num_seeds", "2",
        "--outdir", outdir, "--db", db, "--command_file", retry,
    ])
    out = capsys.readouterr().out
    assert "sweep complete" in out
    assert not os.path.exists(retry)
