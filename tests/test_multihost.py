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


@pytest.mark.slow
def test_orbax_save_restore_under_sharding(tmp_path):
    """Checkpoint round trip of a mesh-SHARDED ensemble TrainState
    (VERDICT r2 #8): save mid-run, restore into a zeroed template, re-shard,
    continue training — the continued run must be bit-identical to the
    uninterrupted one (same compiled program either side of the round trip).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from group_attribution_for_diffusion_models_tpu.config import (
        SchedulerSpec,
        UNetSpec,
    )
    from group_attribution_for_diffusion_models_tpu.data import (
        make_synthetic,
        sample_removal,
    )
    from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.parallel import (
        EnsembleTrainer,
        make_mesh,
    )
    from group_attribution_for_diffusion_models_tpu.training import make_optimizer
    from group_attribution_for_diffusion_models_tpu.utils.ckpt import (
        load_checkpoint,
        save_checkpoint,
    )

    spec = SchedulerSpec()
    unet_spec = UNetSpec(
        sample_size=8,
        block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1,
        norm_num_groups=4,
    )
    model = UNet2D(unet_spec)
    ds = make_synthetic(n=32, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    mesh = make_mesh((4, 2), ("ensemble", "data"))
    trainer = EnsembleTrainer(
        apply_fn=model.apply,
        tx=make_optimizer("adam", lr=1e-3),
        schedule=make_schedule(spec),
        spec=spec,
        images_u8=images_u8,
        member_indices=[sample_removal("shapley", 32, seed=s)[0] for s in range(4)],
        batch_size=4,
        mesh=mesh,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = trainer.init_state(params=params)
    state, _ = trainer.run_scanned(state, 2, seed=7)

    # Branch point: host snapshot (run_scanned donates its input).
    host_mid = jax.tree_util.tree_map(np.asarray, state)
    save_checkpoint(str(tmp_path / "m0"), 2, host_mid)

    # Uninterrupted continuation.
    cont = jax.device_put(host_mid, trainer._sharding)
    cont, _ = trainer.run_scanned(cont, 2, seed=8)
    host_cont = jax.tree_util.tree_map(np.asarray, cont)

    # Restore into a ZEROED template (proves values come from disk), then
    # re-shard onto the mesh and continue with the same key stream.
    template = jax.tree_util.tree_map(np.zeros_like, host_mid)
    restored, meta = load_checkpoint(str(tmp_path / "m0"), template)
    assert meta["step"] == 2
    for a, b in zip(
        jax.tree_util.tree_leaves(restored), jax.tree_util.tree_leaves(host_mid)
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b))

    resumed = jax.device_put(restored, trainer._sharding)
    leaf = jax.tree_util.tree_leaves(resumed.params)[0]
    assert len(leaf.sharding.device_set) >= 4  # genuinely sharded again
    resumed, _ = trainer.run_scanned(resumed, 2, seed=8)
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.tree_util.tree_map(np.asarray, resumed)),
        jax.tree_util.tree_leaves(host_cont),
    ):
        assert np.array_equal(a, b)  # bit-identical: same program, same inputs
