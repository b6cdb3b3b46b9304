"""Checkpoint ABI tests: save/load roundtrip, latest discovery, recovery."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.config import UNetSpec
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.training import TrainState, make_optimizer
from group_attribution_for_diffusion_models_tpu.utils.ckpt import (
    get_max_steps,
    load_checkpoint,
    load_unet_spec,
    resume_or_init,
    save_checkpoint,
)

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "DownBlock2D"),
    up_block_types=("UpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def _state():
    model = UNet2D(TINY)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    tx = make_optimizer("adam", lr=1e-3)
    return TrainState.create(params, tx)


def test_roundtrip_with_meta(tmp_path):
    model_dir = str(tmp_path / "models")
    state = _state()
    remaining = np.array([0, 2, 4])
    removed = np.array([1, 3])
    save_checkpoint(
        model_dir, 100, state, remaining, removed, total_steps_time=12.5,
        unet_spec=TINY,
    )
    restored, meta = load_checkpoint(model_dir, state)
    for a, b in zip(
        jax.tree_util.tree_leaves(state.params),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert meta["remaining_idx"] == [0, 2, 4]
    assert meta["total_steps_time"] == 12.5
    spec = load_unet_spec(meta)
    assert spec == TINY


def test_latest_discovery(tmp_path):
    model_dir = str(tmp_path / "models")
    state = _state()
    save_checkpoint(model_dir, 5, state)
    save_checkpoint(model_dir, 20, state)
    save_checkpoint(model_dir, 10, state)
    assert get_max_steps(model_dir) == 20
    _, meta = load_checkpoint(model_dir, state)
    assert meta["step"] == 20
    assert get_max_steps(str(tmp_path / "nope")) is None


def test_resume_or_init_paths(tmp_path):
    model_dir = str(tmp_path / "models")
    state = _state()
    # Fresh: no checkpoint.
    st, meta, resumed = resume_or_init(model_dir, state)
    assert not resumed
    # After save: resumes.
    save_checkpoint(model_dir, 7, state)
    st, meta, resumed = resume_or_init(model_dir, state)
    assert resumed and meta["step"] == 7
    # Corrupted: wiped and reinit.
    import shutil

    ckpt = os.path.join(model_dir, "ckpt_steps_00000007")
    shutil.rmtree(os.path.join(ckpt, "state"))
    with open(os.path.join(ckpt, "state"), "w") as f:
        f.write("garbage")
    st, meta, resumed = resume_or_init(model_dir, state)
    assert not resumed
    assert not os.path.exists(model_dir)


def test_pruned_spec_roundtrip(tmp_path):
    """Pruned architecture travels as config, not pickled module."""
    import dataclasses

    pruned = dataclasses.replace(TINY, pruned_channels={"mid_res_0": 8})
    model_dir = str(tmp_path / "m")
    state = _state()
    save_checkpoint(model_dir, 0, state, unet_spec=pruned)
    _, meta = load_checkpoint(model_dir, state)
    spec = load_unet_spec(meta)
    assert spec.pruned_channels == {"mid_res_0": 8}
