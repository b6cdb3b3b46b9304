"""convert_weights CLI: torch -> framework round trip with spec validation."""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _fake_torch_unet(tmp_path):
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.cli.common import config_for
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.models.convert_diffusers import (
        export_unet_state_dict,
    )

    cfg = config_for("synthetic_64x8")
    model = UNet2D(cfg.unet)
    params = model.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 8, 8, 3)), jnp.zeros((1,), jnp.int32)
    )["params"]
    sd = {
        k: torch.from_numpy(np.asarray(v).copy())
        for k, v in export_unet_state_dict(
            jax.tree_util.tree_map(np.asarray, params)
        ).items()
    }
    path = str(tmp_path / "unet.pt")
    torch.save(sd, path)
    return path, params


def test_unet_conversion_roundtrip(tmp_path):
    import jax

    from group_attribution_for_diffusion_models_tpu.cli import convert_weights
    from group_attribution_for_diffusion_models_tpu.pipelines import load_ckpt_model

    src, orig_params = _fake_torch_unet(tmp_path)
    dst = str(tmp_path / "ckpt")
    convert_weights.main([
        "--kind", "unet", "--src", src, "--dst", dst,
        "--dataset", "synthetic_64x8",
    ])
    pipe = load_ckpt_model(dst, "synthetic_64x8")
    for a, b in zip(
        jax.tree_util.tree_leaves(orig_params),
        jax.tree_util.tree_leaves(pipe.state.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_unet_conversion_wrong_spec_fails(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import convert_weights

    src, _ = _fake_torch_unet(tmp_path)
    with pytest.raises(SystemExit, match="does not match"):
        convert_weights.main([
            "--kind", "unet", "--src", src, "--dst", str(tmp_path / "bad"),
            "--dataset", "cifar",
        ])


def test_aesthetic_head_conversion(tmp_path):
    from group_attribution_for_diffusion_models_tpu.cli import convert_weights

    sd = {"layers.0.weight": torch.randn(1, 16), "layers.0.bias": torch.randn(1)}
    src = str(tmp_path / "head.pt")
    torch.save(sd, src)
    dst = str(tmp_path / "head.npz")
    convert_weights.main(["--kind", "aesthetic", "--src", src, "--dst", dst])
    store = np.load(dst)
    assert store["kernel"].shape == (16, 1)
    assert store["bias"].shape == (1,)
