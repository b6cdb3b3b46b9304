"""Pallas JL random projection: project per-sample gradients without ever
materializing the projection matrix.

TPU-native replacement for trak's fast-jl CUDA kernel
(`trak.projectors.CudaProjector`, reference src/attributions/methods/
d_trak_grad.py:504-511, text_to_image/grad_text_to_image_lora.py:561-568;
SURVEY.md §2.6). Gradient dimension D is O(10^7-10^9) and target dim P is
1k-32k, so R (D x P) can never exist in memory. The kernel streams G-tiles
through VMEM and generates matching Rademacher R-tiles *inside* the kernel
from the on-core PRNG — each (d-tile, p-tile) seeds deterministically from
(seed, i, j), so the projection is reproducible across runs, shards, and
restarts regardless of tiling order.

Y[B, P] = sum_d G[B, d-tile] @ R[d-tile, P-tile] / sqrt(P)

Rademacher entries (+-1) come from one random bit each; the matmul runs on
the MXU in fp32 accumulation. Off-TPU (tests), the same kernel runs in
Pallas interpret mode.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_D = 2048
TILE_P = 512


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover
        return False


def _jl_kernel(seed_ref, g_ref, out_ref):
    """One (p-tile j, d-tile i) grid cell: out += G_tile @ R_tile(seed,i,j).

    Grid order matters: the accumulated output block must be revisited on
    CONSECUTIVE grid steps, so the reduction (d) axis is the INNER grid dim —
    out block j stays VMEM-resident while every d-tile streams through.
    (With d outer, the pipeline write-back/reload of partial sums silently
    corrupts the accumulation once proj_dim spans multiple p-tiles.)
    """
    j = pl.program_id(0)  # p tile (outer)
    i = pl.program_id(1)  # d tile (inner; accumulation axis)
    tile_d, tile_p = g_ref.shape[1], out_ref.shape[1]

    # Deterministic per-(i, j) seed, independent of grid iteration order.
    pltpu.prng_seed(seed_ref[0] + i * 1_000_003 + j * 7_919)
    bits = pltpu.prng_random_bits((tile_d, tile_p))
    # +-1.0f in two integer ops: the word's top bit becomes the float sign
    # bit of 1.0f (0x3f800000) via bitcast — no compare/select/convert pass.
    r = pltpu.bitcast(
        (bits & jnp.uint32(0x80000000)) | jnp.uint32(0x3F800000), jnp.float32
    )

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += jnp.dot(
        g_ref[:].astype(jnp.float32), r, preferred_element_type=jnp.float32
    )


def jl_project_xla(
    grads: jnp.ndarray,
    proj_dim: int,
    seed: int = 0,
    tile_d: int = TILE_D,
) -> jnp.ndarray:
    """Pure-XLA blocked JL projection (non-TPU backends and cross-checks).

    Same contract as `jl_project` (deterministic by seed, Rademacher tiles
    generated per d-tile, matrix never fully materialized) but seeded from
    jax.random fold-ins, so outputs differ bit-wise from the Pallas kernel's
    on-core PRNG; any single feature store must be built with one backend.
    """
    if grads.ndim != 2:
        raise ValueError(f"grads must be (B, D), got {grads.shape}")
    b, d = grads.shape
    d_pad = -(-d // tile_d) * tile_d
    if d_pad != d:
        grads = jnp.pad(grads, ((0, 0), (0, d_pad - d)))
    tiles = grads.reshape(b, d_pad // tile_d, tile_d).transpose(1, 0, 2)
    base = jax.random.PRNGKey(seed)

    def body(acc, inputs):
        i, g_tile = inputs
        r = jax.random.rademacher(
            jax.random.fold_in(base, i), (tile_d, proj_dim), jnp.float32
        )
        return acc + g_tile @ r, None

    acc0 = jnp.zeros((b, proj_dim), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (jnp.arange(tiles.shape[0]), tiles))
    return out / jnp.sqrt(float(proj_dim))


def jl_project(
    grads: jnp.ndarray,
    proj_dim: int,
    seed: int = 0,
    tile_d: int = TILE_D,
    tile_p: int = TILE_P,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Project (B, D) gradient rows to (B, proj_dim) with seeded Rademacher JL.

    D and proj_dim are zero-padded to tile multiples (zero columns contribute
    nothing; padded outputs are sliced off). Output scale is 1/sqrt(proj_dim)
    so squared norms are preserved in expectation (the JL property).

    On non-TPU backends this dispatches to `jl_project_xla` (the Pallas-TPU
    interpreter does not model per-tile PRNG seeding faithfully).
    """
    if grads.ndim != 2:
        raise ValueError(f"grads must be (B, D), got {grads.shape}")
    if interpret is None:
        interpret = not _on_tpu()
    if interpret:
        return jl_project_xla(grads, proj_dim, seed=seed, tile_d=tile_d)
    b, d = grads.shape
    d_pad = -(-d // tile_d) * tile_d
    p_pad = -(-proj_dim // tile_p) * tile_p
    if d_pad != d:
        grads = jnp.pad(grads, ((0, 0), (0, d_pad - d)))

    # p outer, d inner: the reduction axis must vary fastest (see _jl_kernel).
    grid = (p_pad // tile_p, d_pad // tile_d)
    seed_arr = jnp.asarray([seed], jnp.int32)

    out = pl.pallas_call(
        _jl_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                # index_map takes the scalar-prefetch ref as trailing arg.
                pl.BlockSpec(
                    (b, tile_d), lambda j, i, seed: (0, i), memory_space=pltpu.VMEM
                ),
            ],
            out_specs=pl.BlockSpec(
                (b, tile_p), lambda j, i, seed: (0, j), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((b, p_pad), jnp.float32),
        interpret=interpret,
    )(seed_arr, grads)

    return out[:, :proj_dim] / jnp.sqrt(float(proj_dim))


def jl_project_pytree(
    grad_tree,
    proj_dim: int,
    seed: int = 0,
    **kwargs,
) -> jnp.ndarray:
    """Flatten a batch-of-gradients pytree (leaves (B, ...)) and project."""
    leaves = jax.tree_util.tree_leaves(grad_tree)
    b = leaves[0].shape[0]
    flat = jnp.concatenate([l.reshape(b, -1) for l in leaves], axis=1)
    return jl_project(flat, proj_dim, seed=seed, **kwargs)
