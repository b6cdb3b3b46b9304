"""Two-process jax.distributed smoke: one sharded ensemble step over a
multi-process CPU backend (SURVEY.md §5.8 — the multi-host collective path
the reference delegates entirely to SLURM+Accelerate and never tests)."""

import os
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_sharded_ensemble_step(tmp_path):
    port = _free_port()
    out = tmp_path / "losses.txt"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(__file__))

    procs = []
    for pid in range(2):
        procs.append(
            subprocess.Popen(
                [
                    sys.executable, "-m",
                    "group_attribution_for_diffusion_models_tpu.parallel.multihost",
                    "--coordinator_address", f"127.0.0.1:{port}",
                    "--num_processes", "2",
                    "--process_id", str(pid),
                    "--local_cpu_devices", "2",
                    "--out", str(out),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    outputs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        outputs.append(stdout.decode())
    for p, text in zip(procs, outputs):
        assert p.returncode == 0, text
    # 2 processes x 2 local devices = 4 global devices; only process 0
    # writes the result (is_main gating).
    assert "global devices=4" in outputs[0] + outputs[1]
    losses = [float(x) for x in out.read_text().split()]
    assert len(losses) == 4
