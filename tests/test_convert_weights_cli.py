"""convert_weights CLI: torch -> framework round trip with spec validation."""

import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # end-to-end CLI tier; deselect with -m 'not slow'

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


def test_convert_vqvae_cli_roundtrip(tmp_path):
    """convert_weights --kind vqvae: torch-layout VQModel dict -> .npy tree
    that cli.main --vqvae_weights / load_vqvae consume."""
    import jax
    import jax.numpy as jnp
    import torch

    from group_attribution_for_diffusion_models_tpu.cli import convert_weights
    from group_attribution_for_diffusion_models_tpu.cli.common import config_for
    from group_attribution_for_diffusion_models_tpu.models.convert_diffusers import (
        export_vqvae_state_dict,
    )
    from group_attribution_for_diffusion_models_tpu.models.vqvae import (
        VQVAE,
        load_vqvae,
    )

    cfg = config_for("synthetic_32x16_ldm")
    vq = VQVAE(cfg.vqvae)
    params = vq.init(jax.random.PRNGKey(3), jnp.zeros((1, 16, 16, 3)))["params"]
    sd = {k: torch.tensor(np.asarray(v))
          for k, v in export_vqvae_state_dict(
              jax.tree_util.tree_map(np.asarray, params)).items()}
    src = str(tmp_path / "vq.pt")
    torch.save(sd, src)

    dst = str(tmp_path / "vq_params.npy")
    convert_weights.main([
        "--kind", "vqvae", "--src", src, "--dst", dst,
        "--dataset", "synthetic_32x16_ldm",
    ])
    _, variables = load_vqvae(cfg.vqvae, dst)
    img = vq.apply(variables, jnp.zeros((1, 4, 4, 3)), method=vq.decode)
    want = vq.apply({"params": params}, jnp.zeros((1, 4, 4, 3)), method=vq.decode)
    np.testing.assert_allclose(np.asarray(img), np.asarray(want), atol=1e-6)


def test_convert_blip_cli(tmp_path):
    import jax.numpy as jnp
    import torch
    import transformers

    from group_attribution_for_diffusion_models_tpu.cli import convert_weights
    from group_attribution_for_diffusion_models_tpu.models.blip_vision import (
        BlipVisionTower,
        load_blip_vision,
    )

    cfg = transformers.BlipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
    )
    torch.manual_seed(0)
    hf = transformers.BlipVisionModel(cfg).eval()
    src = str(tmp_path / "blip.pt")
    torch.save(hf.state_dict(), src)
    dst = str(tmp_path / "blip_params.npy")
    convert_weights.main(["--kind", "blip_vision", "--src", src, "--dst", dst])

    model = BlipVisionTower(image_size=32, patch_size=8, width=32, layers=2,
                            heads=2, mlp_dim=64)
    _, variables = load_blip_vision(dst, tiny=True)
    out = model.apply(variables, jnp.zeros((2, 32, 32, 3)))
    assert out.shape == (2, 32)


def test_load_clip_text_npz_roundtrip(tmp_path):
    """Converted .npz text-encoder params load back bit-exact, so identical
    prompts give identical embeddings in every process (cli.main conditional
    path)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from group_attribution_for_diffusion_models_tpu.models.clip_text import (
        CLIPTextEncoder,
        load_clip_text,
    )

    text = CLIPTextEncoder(vocab_size=64, width=16, layers=2, heads=2)
    params = text.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 77), jnp.int32)
    )["params"]

    def flatten(tree, prefix=""):
        out = {}
        for k, v in tree.items():
            key = f"{prefix}/{k}" if prefix else k
            out.update(flatten(v, key)) if isinstance(v, dict) else out.__setitem__(
                key, np.asarray(v)
            )
        return out

    path = tmp_path / "text.npz"
    np.savez(path, **flatten(params))
    loaded = load_clip_text(str(path))

    ids = jnp.asarray(np.array([[1, 5, 9] + [0] * 74]))
    a = text.apply({"params": params}, ids)
    b = text.apply({"params": loaded}, ids)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
