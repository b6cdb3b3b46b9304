"""The ensemble axis: subset-parallel retraining as one compiled program.

This is the framework's headline lever (SURVEY.md §2.7). The reference runs
one SLURM process per removal seed — hundreds of sequential/array jobs, each
retraining on its subset (reference text_to_image/experiments/train.job:16-21,
setup_unlearn_commands.py:213-218). Here the removal seeds become a leading
**ensemble dimension**: member train-states are stacked pytrees, the train
step is `jax.vmap`-ed over that axis, and the stacked state is sharded over
the mesh's "ensemble" axis — so B subset-retrains advance per device step
with zero cross-member communication and near-perfect scaling.

Data path (speed-of-light on HBM): the whole training set stays resident
on-device as uint8; per member, per step, batch indices are drawn **on
device** from the member's padded remaining-index table (wraparound padding +
per-member modular arithmetic keeps shapes static), gathered, and normalized
to [-1, 1] in-kernel. The host sends nothing per step but a PRNG key.

Every member sees exactly its own subset (identical semantics to a dedicated
per-subset dataloader with uniform-with-replacement sampling); subset
identity comes from data.removal's seed-deterministic samplers.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config.registry import SchedulerSpec
from ..diffusion.schedulers import ScheduleState
from ..training.state import TrainState
from ..training.train import make_train_step
from .mesh import ensemble_sharding


def _step_seed(seed: int, step: int) -> int:
    """Per-step PRNG seed, reduced mod 2**32.

    PRNGKey truncates Python-int seeds to 32 bits anyway (x64 disabled), so
    the explicit mod changes no key sequence — but it keeps the value inside
    int32/uint32 range so run_scanned's device-side seed array can't overflow
    for large user seeds (seed >= 2148 used to raise at trace time)."""
    return (seed * 1_000_003 + step) % (1 << 32)


def pad_member_indices(
    member_indices: Sequence[np.ndarray], pad_multiple: int = 128
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack ragged remaining-index lists into a (B, max_n) table.

    Padding repeats each member's indices cyclically, so any slot < max_n is a
    valid datum; sampling stays uniform because draws are taken modulo the
    member's true size.
    """
    sizes = np.asarray([len(ix) for ix in member_indices], dtype=np.int32)
    if (sizes == 0).any():
        raise ValueError("every ensemble member needs a nonempty subset")
    max_n = int(-(-sizes.max() // pad_multiple) * pad_multiple)
    table = np.zeros((len(member_indices), max_n), dtype=np.int32)
    for row, ix in enumerate(member_indices):
        reps = -(-max_n // len(ix))
        table[row] = np.tile(np.asarray(ix, dtype=np.int32), reps)[:max_n]
    return table, sizes


def stack_states(states: Sequence[TrainState]) -> TrainState:
    """Stack per-member TrainStates along a new leading ensemble axis."""
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *states)


def unstack_state(stacked: TrainState, member: int) -> TrainState:
    """Extract one member's TrainState from the stacked ensemble."""
    return jax.tree_util.tree_map(lambda x: x[member], stacked)


def init_ensemble_state(
    params, tx: optax.GradientTransformation, num_members: int, init_keys=None,
    init_fn: Optional[Callable] = None,
) -> TrainState:
    """Stacked TrainState: identical init (sparse-FT from one pruned model) or
    per-member random init via `init_fn(key)` (independent retrains)."""
    if init_fn is not None:
        states = [
            TrainState.create(init_fn(k), tx)
            for k in (init_keys if init_keys is not None else [])
        ]
        if not states:
            raise ValueError("init_fn requires init_keys")
        return stack_states(states)
    one = TrainState.create(params, tx)
    return jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (num_members,) + x.shape).copy(), one
    )


@dataclasses.dataclass
class EnsembleTrainer:
    """Compiled subset-parallel trainer.

    Args:
        apply_fn: model.apply of the (shared-architecture) U-Net.
        tx: optax transformation (shared across members).
        schedule/spec: noise schedule.
        images_u8: full training set, (N, H, W, C) uint8, resident on device.
        member_indices: per-member remaining indices (ragged), from
            data.removal samplers.
        batch_size: per-member batch size.
        mesh: optional Mesh; when given, the stacked state and step outputs
            are sharded over its "ensemble" axis.
    """

    apply_fn: Callable
    tx: optax.GradientTransformation
    schedule: ScheduleState
    spec: SchedulerSpec
    images_u8: np.ndarray
    member_indices: Sequence[np.ndarray]
    batch_size: int
    mesh: Optional[object] = None
    ema_max_decay: float = 0.9999
    ema_power: float = 0.75
    # Common random numbers across members: every member draws the SAME
    # timesteps/noise (and slot indices) each step, so two members differ
    # ONLY through their data subsets. This is what the reference's SLURM
    # sweep does implicitly (every job runs with the same default seed,
    # main.py --opt_seed), and it collapses the retrain-noise variance of
    # between-subset behavior comparisons — measured on the 512x8_c6
    # templated synthetic, within-identical-subset eval-loss spread drops
    # from ~0.13 (above the 0.10 between-subset signal) to 0.
    common_noise: bool = False

    def __post_init__(self):
        table, sizes = pad_member_indices(self.member_indices)
        self.num_members = len(self.member_indices)
        self._table = jnp.asarray(table)
        self._sizes = jnp.asarray(sizes)
        self._images = jnp.asarray(self.images_u8)
        if self._images.dtype != jnp.uint8 and self._images.dtype != jnp.float32:
            raise ValueError("images must be uint8 or float32")

        ens_size = (
            self.mesh.shape["ensemble"]
            if self.mesh is not None and "ensemble" in self.mesh.axis_names
            else 1
        )
        data_size = (
            self.mesh.shape["data"]
            if self.mesh is not None and "data" in self.mesh.axis_names
            else 1
        )
        use_shard_map = self.mesh is not None
        if self.mesh is not None and (
            "ensemble" not in self.mesh.axis_names
            or self.num_members % max(ens_size, 1)
            or self.batch_size % max(data_size, 1)
            or any(a not in ("ensemble", "data") for a in self.mesh.axis_names)
        ):
            import warnings

            warnings.warn(
                f"EnsembleTrainer: mesh {dict(self.mesh.shape)} does not fit "
                f"{self.num_members} members / batch {self.batch_size} "
                "(missing 'ensemble' axis or non-divisible); falling back to "
                "GSPMD auto-sharding with data-axis parallelism disabled "
                "(per-member determinism not guaranteed — see tests/"
                "test_ensemble.py::test_common_noise_holds_under_ensemble_mesh "
                "history)",
                stacklevel=3,
            )
            use_shard_map = False
            # The fallback traces local_step outside shard_map, where
            # lax.axis_index("data") is unbound — run it data-unsliced
            # (full batch per member; GSPMD may still auto-shard the math).
            data_size = 1

        member_step = make_train_step(
            self.apply_fn,
            self.tx,
            self.schedule,
            self.spec,
            ema_max_decay=self.ema_max_decay,
            ema_power=self.ema_power,
            pmean_axis="data" if (use_shard_map and data_size > 1) else None,
            metric_norms=False,
        )

        # Data tables enter as jit ARGUMENTS, not closure constants: captured
        # arrays are serialized into the HLO (huge compile payloads and
        # recompiles when they change).
        def local_step(stacked, key, images, table, sizes, member0):
            """Step `local_nm` members whose global ids start at `member0`.

            Runs both unsharded (local_nm == num_members, member0 == 0) and as
            the per-shard body under shard_map. Key derivation is global —
            per-member keys are split for the FULL ensemble and sliced — so a
            member's noise/timestep/index stream is identical no matter how
            the ensemble is laid out across devices.
            """
            local_nm = sizes.shape[0]
            if self.common_noise:
                k2 = jax.random.split(key, 2)
                k_idx = jnp.broadcast_to(k2[0], (local_nm,) + k2[0].shape)
                k_step = jnp.broadcast_to(k2[1], (local_nm,) + k2[1].shape)
            else:
                keys = jax.random.split(key, self.num_members)
                keys = jax.lax.dynamic_slice_in_dim(keys, member0, local_nm)
                member_keys = jax.vmap(jax.random.split)(keys)
                k_idx, k_step = member_keys[:, 0], member_keys[:, 1]
            # Per-member on-device batch index draw (uniform over the member's
            # true subset via the cyclic-padded table). Always the full batch
            # draw; a >1 data axis slices its shard below, so the examples a
            # member trains on do not depend on the data-parallel width.
            slot = jax.vmap(
                lambda k, size: jax.random.randint(k, (self.batch_size,), 0, size)
            )(k_idx, sizes)
            if data_size > 1:
                d = jax.lax.axis_index("data")
                local_bs = self.batch_size // data_size
                slot = jax.lax.dynamic_slice_in_dim(
                    slot, d * local_bs, local_bs, axis=1
                )
                # Distinct noise/timesteps per data shard (grads pmean over
                # "data" inside member_step recombine them).
                k_step = jax.vmap(lambda k: jax.random.fold_in(k, d))(k_step)
            idx = jnp.take_along_axis(table, slot, axis=1)
            batch = images[idx]  # (B, batch, H, W, C)
            if batch.dtype == jnp.uint8:
                batch = batch.astype(jnp.float32) / 127.5 - 1.0
            return jax.vmap(member_step)(stacked, batch, k_step)

        if use_shard_map:
            # Explicit per-device computation: each shard owns whole members
            # and runs the SAME program a smaller unsharded ensemble would.
            # This is both the performance layout (zero cross-member
            # collectives; the only communication is the optional grad pmean
            # over "data") and the correctness fix for the GSPMD anomaly where
            # auto-partitioned value_and_grad computed member-row-dependent
            # values on XLA:CPU (identical members diverged under
            # common_noise).
            from jax.sharding import PartitionSpec as P

            local_nm = self.num_members // ens_size

            def ensemble_step(stacked, key, images, table, sizes):
                def shard_body(stacked, key, images, table, sizes):
                    member0 = (
                        jax.lax.axis_index("ensemble") * local_nm
                        if ens_size > 1
                        else 0
                    )
                    return local_step(
                        stacked, key[0], images, table, sizes, member0
                    )

                return jax.shard_map(
                    shard_body,
                    mesh=self.mesh,
                    in_specs=(
                        P("ensemble"), P(None), P(None),
                        P("ensemble"), P("ensemble"),
                    ),
                    out_specs=(P("ensemble"), P("ensemble")),
                    check_vma=False,
                )(stacked, key[None], images, table, sizes)

        else:

            def ensemble_step(stacked, key, images, table, sizes):
                return local_step(stacked, key, images, table, sizes, 0)

        self._ensemble_step_fn = ensemble_step
        self._scan_jit = None

        # Donating the stacked state lets XLA update parameters/opt state in
        # place instead of double-buffering ~GBs of HBM per step.
        # A mesh without an "ensemble" axis can't express the stacked-state
        # sharding; the fallback runs as a plain donated jit instead.
        self._sharding = (
            ensemble_sharding(self.mesh)
            if self.mesh is not None and "ensemble" in self.mesh.axis_names
            else None
        )
        if self._sharding is not None:
            sh = self._sharding
            self._step = jax.jit(
                ensemble_step,
                in_shardings=(sh, None, None, None, None),
                out_shardings=(sh, sh),
                donate_argnums=0,
            )
        else:
            self._step = jax.jit(ensemble_step, donate_argnums=0)

    def init_state(self, params=None, init_fn=None, seed: int = 0) -> TrainState:
        if self.common_noise:
            # One shared init: retrains differ only through their subsets
            # (and chunked sweeps stay init-consistent across chunks).
            keys = [jax.random.PRNGKey(seed)] * self.num_members
        else:
            keys = jax.random.split(jax.random.PRNGKey(seed), self.num_members)
        stacked = init_ensemble_state(
            params, self.tx, self.num_members,
            init_keys=keys if init_fn is not None else None, init_fn=init_fn,
        )
        if self._sharding is not None:
            stacked = jax.device_put(stacked, self._sharding)
        return stacked

    def step(self, stacked: TrainState, key: jax.Array):
        """One parallel step for all members: (state, metrics) with leading B."""
        return self._step(stacked, key, self._images, self._table, self._sizes)

    def run(self, stacked: TrainState, num_steps: int, seed: int = 0,
            log_every: int = 0, log_fn: Optional[Callable] = None):
        """Drive num_steps ensemble steps; returns (state, last_metrics).

        `log_fn(metrics, step)` fires every `log_every` steps (0 = never);
        metrics values carry the leading ensemble dim. The host sync it
        forces is the only one in the loop."""
        metrics = None
        for i in range(num_steps):
            stacked, metrics = self.step(
                stacked, jax.random.PRNGKey(_step_seed(seed, i))
            )
            if log_fn is not None and log_every and (i + 1) % log_every == 0:
                log_fn(metrics, i + 1)
        return stacked, metrics

    def run_scanned(self, stacked: TrainState, num_steps: int, seed: int = 0,
                    chunk: int = 0):
        """Like run(), but the step loop is a `lax.scan` on device: one
        dispatch per `chunk` steps (default: the whole run), eliminating
        per-step host round-trips — the difference matters when steps are
        sub-100ms or dispatch goes through a remote relay.

        Per-step PRNG keys match run()'s exactly, so run_scanned(s, n) and
        run(s, n) with the same seed produce identical states. Returns
        (state, metrics) where metrics carry a leading (num_steps,) time axis.
        """
        chunk = min(chunk or num_steps, num_steps)
        if self._scan_jit is None:
            fn = self._ensemble_step_fn

            def scan_chunk(stacked, keys, images, table, sizes):
                def body(st, key):
                    return fn(st, key, images, table, sizes)

                return jax.lax.scan(body, stacked, keys)

            if self._sharding is not None:
                sh = self._sharding
                self._scan_jit = jax.jit(
                    scan_chunk,
                    in_shardings=(sh, None, None, None, None),
                    out_shardings=(sh, None),
                    donate_argnums=0,
                )
            else:
                self._scan_jit = jax.jit(scan_chunk, donate_argnums=0)

        make_keys = jax.jit(jax.vmap(jax.random.PRNGKey))
        all_metrics = []
        for start in range(0, num_steps, chunk):
            n = min(chunk, num_steps - start)
            seeds = jnp.asarray(
                [_step_seed(seed, i) for i in range(start, start + n)],
                jnp.uint32,
            )
            stacked, metrics = self._scan_jit(
                stacked, make_keys(seeds), self._images, self._table, self._sizes
            )
            all_metrics.append(metrics)
        metrics = jax.tree_util.tree_map(
            lambda *xs: jnp.concatenate(xs) if len(xs) > 1 else xs[0],
            *all_metrics,
        )
        return stacked, metrics
