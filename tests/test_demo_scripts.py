"""The one-command quality-demo scripts stay runnable end to end.

scripts/{pixel,latent}_quality_demo.sh wrap the Shapley estimation pipeline
(reference SLURM retrain sweep + lds.py collapsed into cli.shapley_pipeline)
at demo scale; these tests drive them at smoke scale so flag drift in the
underlying CLIs breaks loudly here instead of in a 2-hour TPU run.
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_script(name, tmp_path, extra_env):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=2",
        OUT=str(tmp_path),
        DATASET="synthetic_64x8_tpl_mix",
        FIT="2",
        TEST="2",
        STEPS="4",
        **extra_env,
    )
    return subprocess.run(
        ["bash", os.path.join(REPO, "scripts", name)],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1500,
    )


def _assert_pipeline_db(proc, db_path):
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "LDS =" in proc.stdout + proc.stderr
    rows = [json.loads(line) for line in open(db_path)]
    # fit rows: the demos default to antithetic paired Shapley sampling
    assert any(
        r.get("removal_dist") in ("shapley", "shapley_paired") for r in rows
    )
    assert any(r.get("removal_dist") == "datamodel" for r in rows)


def test_pixel_quality_demo(tmp_path):
    proc = _run_script("pixel_quality_demo.sh", tmp_path, {})
    _assert_pipeline_db(
        proc, tmp_path / "synthetic_64x8_tpl_mix_pipeline_db.jsonl"
    )


def test_latent_quality_demo(tmp_path):
    proc = _run_script("latent_quality_demo.sh", tmp_path, {"VQ_STEPS": "4"})
    _assert_pipeline_db(
        proc, tmp_path / "synthetic_64x8_tpl_mix_ldm_pipeline_db.jsonl"
    )
    # The script must have trained and reused its own VQ weights.
    assert (tmp_path / "vqvae_weights.npy").exists()


if __name__ == "__main__":
    sys.exit(pytest.main([__file__, "-v"]))
