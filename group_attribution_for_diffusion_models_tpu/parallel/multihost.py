"""Multi-host (multi-process) launch helpers.

The reference's multi-node story is "SLURM array of independent single-node
jobs" — no collective ever spans hosts (SURVEY.md §5.8). Here multi-host IS
a first-class path: `initialize()` wraps jax.distributed.initialize, after
which `jax.devices()` is the global device list, the standard
("ensemble", "data") mesh spans hosts, and the ensemble trainer's sharded
step runs SPMD with XLA collectives riding ICI/DCN. I/O (checkpoints, JSONL
rows) is gated on `is_main()` — the jax.process_index()==0 analogue of the
reference's accelerator.is_main_process gating (reference
unconditional_generation/main.py:256-259).

`python -m group_attribution_for_diffusion_models_tpu.parallel.multihost`
runs a one-step sharded-ensemble smoke (used by the 2-process CPU test in
tests/test_multihost.py, the hardware-free distributed check the reference
never had — SURVEY.md §4).
"""

from __future__ import annotations

import os
from typing import Optional


def pin_virtual_cpu(n_devices: int) -> None:
    """Force an n-virtual-device CPU backend before any backend initializes
    (same recipe as tests/conftest.py; this image's sitecustomize registers
    a TPU backend at interpreter startup, so env vars alone are too late)."""
    import re

    flags = os.environ.get("XLA_FLAGS", "")
    opt = f"--xla_force_host_platform_device_count={n_devices}"
    if "xla_force_host_platform_device_count" in flags:
        flags = re.sub(r"--xla_force_host_platform_device_count=\d+", opt, flags)
    else:
        flags = (flags + " " + opt).strip()
    os.environ["XLA_FLAGS"] = flags

    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """jax.distributed.initialize from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; on real
    TPU pods all three are auto-detected and may stay None)."""
    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address
        or os.environ.get("JAX_COORDINATOR_ADDRESS"),
        num_processes=num_processes
        or _env_int("JAX_NUM_PROCESSES"),
        process_id=process_id if process_id is not None
        else _env_int("JAX_PROCESS_ID"),
    )


def _env_int(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def is_main() -> bool:
    import jax

    return jax.process_index() == 0


def _demo(out_path: Optional[str]) -> None:
    """One sharded ensemble train step across all processes' devices."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..config.registry import SchedulerSpec, UNetSpec
    from ..data import make_synthetic, sample_removal
    from ..diffusion import make_schedule
    from ..models import UNet2D
    from ..training import make_optimizer
    from .ensemble import EnsembleTrainer
    from .mesh import make_mesh

    n_dev = len(jax.devices())
    mesh = make_mesh((n_dev, 1), ("ensemble", "data"))
    spec = SchedulerSpec()
    unet_spec = UNetSpec(
        sample_size=8, block_out_channels=(8, 16),
        down_block_types=("DownBlock2D", "DownBlock2D"),
        up_block_types=("UpBlock2D", "UpBlock2D"),
        layers_per_block=1, norm_num_groups=4,
    )
    model = UNet2D(unet_spec)
    ds = make_synthetic(n=32, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [sample_removal("shapley", 32, seed=s)[0] for s in range(n_dev)]
    trainer = EnsembleTrainer(
        apply_fn=model.apply, tx=make_optimizer("adam", lr=1e-3),
        schedule=make_schedule(spec), spec=spec, images_u8=images_u8,
        member_indices=member_idx, batch_size=4, mesh=mesh,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = trainer.init_state(params=params)
    state, metrics = trainer.step(state, jax.random.PRNGKey(0))
    # The loss array is globally sharded (some shards live on other
    # processes' devices); allgather brings the full vector to every host.
    from jax.experimental import multihost_utils

    losses = np.asarray(
        multihost_utils.process_allgather(metrics["loss"], tiled=True)
    )
    assert losses.shape == (n_dev,) and np.isfinite(losses).all()
    print(
        f"process {jax.process_index()}/{jax.process_count()}: "
        f"global devices={n_dev} losses={losses.round(4).tolist()}",
        flush=True,
    )
    if out_path and is_main():  # process_index()==0 gates I/O
        with open(out_path, "w") as f:
            f.write(" ".join(str(float(x)) for x in losses))


def main(argv=None) -> None:
    import argparse

    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--coordinator_address", type=str, default=None)
    parser.add_argument("--num_processes", type=int, default=None)
    parser.add_argument("--process_id", type=int, default=None)
    parser.add_argument("--local_cpu_devices", type=int, default=0,
                        help=">0 pins a virtual CPU backend with that many "
                             "local devices (hardware-free testing)")
    parser.add_argument("--out", type=str, default=None,
                        help="loss file written by process 0")
    args = parser.parse_args(argv)
    if args.local_cpu_devices:
        pin_virtual_cpu(args.local_cpu_devices)
    initialize(args.coordinator_address, args.num_processes, args.process_id)
    _demo(args.out)


if __name__ == "__main__":
    main()
