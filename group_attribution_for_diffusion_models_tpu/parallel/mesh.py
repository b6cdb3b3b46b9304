"""Device-mesh and sharding helpers.

TPU-native replacement for the reference's HF-Accelerate/NCCL layer
(reference unconditional_generation/main.py:209-213,618-630; SURVEY.md §5.8).
There is no process-group plumbing: a `jax.sharding.Mesh` over ICI plus
NamedSharding annotations on the train-state pytree is the whole story — XLA
inserts the psum/all-gather collectives.

Mesh convention (SURVEY.md §2.7): axes ("ensemble", "data"). The ensemble
axis shards independent subset-retrains (no cross-member communication); the
data axis shards each member's batch (gradient psum rides ICI). Tensor/
pipeline axes are unnecessary at these model sizes but the helpers accept
arbitrary axis layouts.
"""

from __future__ import annotations

import warnings
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    mesh_shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("ensemble", "data"),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a mesh over the available devices.

    Default: all devices on the ensemble axis, data axis 1 — the layout for
    subset-parallel retraining where each chip owns whole members.
    """
    devices = list(devices if devices is not None else jax.devices())
    if mesh_shape is None:
        mesh_shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    want = int(np.prod(mesh_shape))
    if want > len(devices):
        # Degrade gracefully: shrink axes (leading first) until the mesh fits
        # the available devices, rather than failing the whole program because
        # the environment has fewer chips than the requested layout.
        shrunk = list(mesh_shape)
        while int(np.prod(shrunk)) > len(devices):
            for i in range(len(shrunk)):
                if shrunk[i] > 1:
                    shrunk[i] -= 1
                    break
        warnings.warn(
            f"make_mesh: requested shape {mesh_shape} needs {want} devices "
            f"but only {len(devices)} are visible; clamping to "
            f"{tuple(shrunk)}",
            stacklevel=2,
        )
        mesh_shape = tuple(shrunk)
        want = int(np.prod(mesh_shape))
    elif want < len(devices):
        # Under-requesting is allowed (e.g. a sub-mesh for a small ensemble)
        # but never silent: a stale mesh flag on a bigger pod would otherwise
        # quietly run at a fraction of the machine.
        warnings.warn(
            f"make_mesh: shape {mesh_shape} uses {want} of "
            f"{len(devices)} visible devices",
            stacklevel=2,
        )
    dev_array = np.asarray(devices[:want]).reshape(mesh_shape)
    return Mesh(dev_array, axis_names)


def shard_ensemble(tree, mesh: Mesh, axis: str = "ensemble"):
    """Place a stacked-members pytree with its leading axis sharded over `axis`."""
    sharding = NamedSharding(mesh, P(axis))
    return jax.device_put(tree, sharding)


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree over the mesh (schedule tables, configs)."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def ensemble_sharding(mesh: Mesh, axis: str = "ensemble") -> NamedSharding:
    return NamedSharding(mesh, P(axis))
