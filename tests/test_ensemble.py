"""Ensemble-axis tests on the virtual 8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import SchedulerSpec, UNetSpec
from group_attribution_for_diffusion_models_tpu.data import (
    make_synthetic,
    sample_removal,
)
from group_attribution_for_diffusion_models_tpu.diffusion import make_schedule
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.parallel import (
    EnsembleTrainer,
    make_mesh,
    pad_member_indices,
    unstack_state,
)
from group_attribution_for_diffusion_models_tpu.training import make_optimizer

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _trainer(num_members=8, mesh=None, n=64):
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    ds = make_synthetic(n=n, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [
        sample_removal("shapley", n, seed=s)[0] for s in range(num_members)
    ]
    tx = make_optimizer("adam", lr=1e-3)
    trainer = EnsembleTrainer(
        apply_fn=model.apply,
        tx=tx,
        schedule=schedule,
        spec=spec,
        images_u8=images_u8,
        member_indices=member_idx,
        batch_size=8,
        mesh=mesh,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    return trainer, params


def test_pad_member_indices():
    table, sizes = pad_member_indices([np.array([1, 2, 3]), np.arange(10)], pad_multiple=4)
    assert table.shape == (2, 12)
    np.testing.assert_array_equal(sizes, [3, 10])
    # Cyclic padding: every slot is a valid member datum.
    assert set(table[0]) == {1, 2, 3}
    assert set(table[1]) == set(range(10))


def test_ensemble_members_diverge_and_learn():
    trainer, params = _trainer(num_members=4)
    state = trainer.init_state(params=params)
    state, metrics = trainer.run(state, 12, seed=0)
    losses = np.asarray(metrics["loss"])
    assert losses.shape == (4,)
    assert np.isfinite(losses).all()
    # Different subsets -> different parameter trajectories.
    m0 = unstack_state(state, 0)
    m1 = unstack_state(state, 1)
    l0 = jax.tree_util.tree_leaves(m0.params)[0]
    l1 = jax.tree_util.tree_leaves(m1.params)[0]
    assert not np.allclose(np.asarray(l0), np.asarray(l1))
    assert int(np.asarray(m0.step)) == 12


def test_ensemble_matches_single_subset_training_semantics():
    """A 1-member ensemble behaves like plain training on that subset."""
    trainer, params = _trainer(num_members=1)
    state = trainer.init_state(params=params)
    state, metrics = trainer.run(state, 5, seed=3)
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_ensemble_sharded_over_mesh():
    mesh = make_mesh((8, 1))
    trainer, params = _trainer(num_members=8, mesh=mesh)
    state = trainer.init_state(params=params)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    # Leading (ensemble) axis is actually sharded over the 8 devices.
    assert len(leaf.sharding.device_set) == 8
    state, metrics = trainer.run(state, 3, seed=1)
    assert np.asarray(metrics["loss"]).shape == (8,)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_per_member_random_init():
    trainer, params = _trainer(num_members=3)
    model = UNet2D(TINY)

    def init_fn(key):
        return model.init(
            key, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
        )["params"]

    state = trainer.init_state(init_fn=init_fn, seed=5)
    diffs = [
        float(np.abs(np.asarray(leaf[0]) - np.asarray(leaf[1])).max())
        for leaf in jax.tree_util.tree_leaves(state.params)
    ]
    assert max(diffs) > 1e-6  # kernels differ across member inits


def test_make_mesh_clamps_to_available_devices():
    """Requesting more devices than visible degrades to a smaller mesh with a
    warning instead of raising (VERDICT r1: a raise here turned an env quirk
    into a failed driver check)."""
    with pytest.warns(UserWarning, match="clamping"):
        mesh = make_mesh((len(jax.devices()) * 2, 2))
    assert mesh.shape["ensemble"] * mesh.shape["data"] <= len(jax.devices())
    # Exact-fit request is untouched and warning-free.
    mesh = make_mesh((len(jax.devices()), 1))
    assert mesh.shape["ensemble"] == len(jax.devices())


def test_run_scanned_matches_run():
    """The on-device lax.scan loop uses the same per-step PRNG keys as the
    dispatch loop, so the trajectories agree up to compile-variant fp32
    rounding (scan and single-step fuse differently; Adam's 1/sqrt(v)
    amplifies ulp-level differences in near-zero leaves, so parity is
    checked on losses and on relative parameter agreement)."""
    trainer, params = _trainer(num_members=2)
    s1 = trainer.init_state(params=params)
    s2 = trainer.init_state(params=params)
    losses1 = []
    s1, m1 = trainer.run(
        s1, 7, seed=5, log_every=1,
        log_fn=lambda m, i: losses1.append(np.asarray(m["loss"])),
    )
    s2, m2 = trainer.run_scanned(s2, 7, seed=5, chunk=3)
    assert np.asarray(m2["loss"]).shape == (7, 2)
    # Identical per-step keys => identical batches/timesteps/noise, so the
    # loss trajectory tracks to fp32 rounding at every step. (Parameter-level
    # comparison is meaningless here: Adam turns 1-ulp gradient differences
    # on near-zero-gradient coordinates into +/-lr sign flips.)
    np.testing.assert_allclose(
        np.stack(losses1), np.asarray(m2["loss"]), rtol=1e-4, atol=1e-5
    )


def test_run_scanned_large_seed_matches_run():
    """seed * 1_000_003 overflows int32 for seed >= 2148; the per-step seed
    math must wrap mod 2**32 (like PRNGKey itself does) instead of raising
    at trace time, and still match run()'s key sequence."""
    trainer, params = _trainer(num_members=2)
    s1 = trainer.init_state(params=params)
    s2 = trainer.init_state(params=params)
    losses1 = []
    s1, _ = trainer.run(
        s1, 3, seed=3000, log_every=1,
        log_fn=lambda m, i: losses1.append(np.asarray(m["loss"])),
    )
    s2, m2 = trainer.run_scanned(s2, 3, seed=3000)
    np.testing.assert_allclose(
        np.stack(losses1), np.asarray(m2["loss"]), rtol=1e-4, atol=1e-5
    )


def test_make_mesh_warns_on_underuse():
    """A sub-mesh is allowed but not silent (stale mesh flags on a bigger
    machine would quietly waste chips)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs >1 device")
    with pytest.warns(UserWarning, match="uses 1 of"):
        make_mesh((1, 1))


def test_run_scanned_sharded():
    mesh = make_mesh((8, 1))
    trainer, params = _trainer(num_members=8, mesh=mesh)
    state = trainer.init_state(params=params)
    state, metrics = trainer.run_scanned(state, 4, seed=2)
    assert np.asarray(metrics["loss"]).shape == (4, 8)
    leaf = jax.tree_util.tree_leaves(state.params)[0]
    assert len(leaf.sharding.device_set) == 8


def test_remat_policy_matches_in_scanned_ensemble():
    """Selective remat composes with vmap(members) + lax.scan(steps) without
    changing training numerics."""
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    ds = make_synthetic(n=32, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [sample_removal("shapley", 32, seed=s)[0] for s in range(2)]

    losses = {}
    for policy in (None, "convs"):
        model = UNet2D(TINY, remat=policy is not None, remat_policy=policy)
        trainer = EnsembleTrainer(
            apply_fn=model.apply,
            tx=make_optimizer("adam", lr=1e-3),
            schedule=schedule,
            spec=spec,
            images_u8=images_u8,
            member_indices=member_idx,
            batch_size=8,
        )
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
            jnp.zeros((1,), jnp.int32),
        )["params"]
        state, metrics = trainer.run_scanned(
            trainer.init_state(params=params), 3, seed=5
        )
        losses[policy] = np.asarray(metrics["loss"])
    np.testing.assert_allclose(losses[None], losses["convs"], rtol=1e-5, atol=1e-6)


def test_common_noise_identical_subsets_identical_members():
    """CRN property: with common_noise, members differ ONLY through data —
    identical subsets must produce bit-identical trained members."""
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    ds = make_synthetic(n=32, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    subset = sample_removal("shapley", 32, seed=0)[0]
    other = sample_removal("shapley", 32, seed=1)[0]
    trainer = EnsembleTrainer(
        apply_fn=model.apply,
        tx=make_optimizer("adam", lr=1e-3),
        schedule=schedule,
        spec=spec,
        images_u8=images_u8,
        member_indices=[subset, subset, other],
        batch_size=4,
        common_noise=True,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]

    def init_fn(key):
        return model.init(key, jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32))["params"]

    state, _ = trainer.run_scanned(
        trainer.init_state(init_fn=init_fn, seed=3), 3, seed=5
    )
    p0 = jax.tree_util.tree_leaves(unstack_state(state, 0).params)
    p1 = jax.tree_util.tree_leaves(unstack_state(state, 1).params)
    p2 = jax.tree_util.tree_leaves(unstack_state(state, 2).params)
    for a, b in zip(p0, p1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert any(
        not np.array_equal(np.asarray(a), np.asarray(c)) for a, c in zip(p0, p2)
    )


def test_common_noise_holds_under_ensemble_mesh():
    """CRN must survive sharding the ensemble axis over devices.

    History: under GSPMD auto-sharding this failed on XLA:CPU — the
    auto-partitioned value_and_grad of the full UNet computed
    member-row-dependent values (~1% loss shift), so identical members
    diverged even under common_noise. EnsembleTrainer now lowers the mesh
    path through an explicit jax.shard_map (each device runs the same
    program a smaller unsharded ensemble would), which restores bit-exact
    member equality; this test keeps it that way.
    """
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    ds = make_synthetic(n=64, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    subset = sample_removal("shapley", 64, seed=0)[0]
    others = [sample_removal("shapley", 64, seed=s)[0] for s in range(1, 15)]
    mesh = make_mesh((2, 1), ("ensemble", "data"), devices=jax.devices()[:2])
    trainer = EnsembleTrainer(
        apply_fn=model.apply,
        tx=make_optimizer("adam", lr=1e-3),
        schedule=schedule,
        spec=spec,
        images_u8=images_u8,
        member_indices=[subset, subset] + others,
        batch_size=8,
        common_noise=True,
        mesh=mesh,
    )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state, m = trainer.run_scanned(trainer.init_state(params=params), 2, seed=5)
    losses = np.asarray(m["loss"])
    np.testing.assert_array_equal(losses[:, 0], losses[:, 1])


def test_crn_invariant_to_shard_placement_with_data_axis():
    """Strong shard_map determinism contract on a (2, 2) mesh: a member's
    training stream is a function of (subset, keys) only — identical-subset
    members agree bit-for-bit whether they share a shard or sit on different
    shards, and across the two placements. Also exercises the explicit
    gradient pmean over the "data" axis."""
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    ds = make_synthetic(n=64, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    subset = sample_removal("shapley", 64, seed=0)[0]
    others = [sample_removal("shapley", 64, seed=s)[0] for s in range(1, 3)]
    mesh = make_mesh((2, 2), ("ensemble", "data"), devices=jax.devices()[:4])
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]

    def run(member_indices):
        trainer = EnsembleTrainer(
            apply_fn=model.apply,
            tx=make_optimizer("adam", lr=1e-3),
            schedule=schedule,
            spec=spec,
            images_u8=images_u8,
            member_indices=member_indices,
            batch_size=8,
            common_noise=True,
            mesh=mesh,
        )
        _, m = trainer.run_scanned(trainer.init_state(params=params), 3, seed=5)
        return np.asarray(m["loss"])

    # Identical pair within one shard (members 0,1 of 4 on a 2-wide axis).
    within = run([subset, subset] + others)
    np.testing.assert_array_equal(within[:, 0], within[:, 1])
    # Identical pair across shards (members 0 and 2).
    across = run([subset, others[0], subset, others[1]])
    np.testing.assert_array_equal(across[:, 0], across[:, 2])
    # And placement does not change the member's stream at all.
    np.testing.assert_array_equal(within[:, 0], across[:, 0])


def test_gspmd_fallback_odd_batch_runs():
    """ADVICE r2 (medium): the divisibility fallback used to trace
    lax.axis_index("data") outside shard_map (NameError 'unbound axis name')
    whenever the mesh had a >1 data axis. The fallback must run data-unsliced
    instead of promising a path that cannot trace."""
    mesh = make_mesh((2, 2))
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    ds = make_synthetic(n=32, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [sample_removal("shapley", 32, seed=s)[0] for s in range(2)]
    with pytest.warns(UserWarning, match="falling back to GSPMD"):
        trainer = EnsembleTrainer(
            apply_fn=model.apply,
            tx=make_optimizer("adam", lr=1e-3),
            schedule=schedule,
            spec=spec,
            images_u8=images_u8,
            member_indices=member_idx,
            batch_size=7,  # odd: does not divide data axis 2
            mesh=mesh,
        )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = trainer.init_state(params=params)
    state, metrics = trainer.step(state, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics["loss"])).all()


def test_mesh_without_ensemble_axis_falls_back():
    """ADVICE r2 (low): a mesh whose axes pass the allowed-set check but lack
    "ensemble" (e.g. data-only) must hit the warned fallback, not an
    unknown-axis shard_map error."""
    mesh = make_mesh((4,), axis_names=("data",))
    spec = SchedulerSpec()
    schedule = make_schedule(spec)
    model = UNet2D(TINY)
    ds = make_synthetic(n=32, size=8)
    images_u8 = ((ds.images + 1.0) * 127.5).astype(np.uint8)
    member_idx = [sample_removal("shapley", 32, seed=s)[0] for s in range(2)]
    with pytest.warns(UserWarning, match="falling back to GSPMD"):
        trainer = EnsembleTrainer(
            apply_fn=model.apply,
            tx=make_optimizer("adam", lr=1e-3),
            schedule=schedule,
            spec=spec,
            images_u8=images_u8,
            member_indices=member_idx,
            batch_size=8,
            mesh=mesh,
        )
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    state = trainer.init_state(params=params)
    state, metrics = trainer.step(state, jax.random.PRNGKey(1))
    assert np.isfinite(np.asarray(metrics["loss"])).all()
