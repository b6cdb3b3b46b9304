"""Round-trip test for the diffusers UNet checkpoint converter."""

import jax
import jax.numpy as jnp
import numpy as np

from group_attribution_for_diffusion_models_tpu.config import UNetSpec
from group_attribution_for_diffusion_models_tpu.models import UNet2D
from group_attribution_for_diffusion_models_tpu.models.convert_diffusers import (
    convert_unet_state_dict,
    export_unet_state_dict,
)

TINY = UNetSpec(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def test_export_import_roundtrip():
    """flax -> torch-layout -> flax preserves every tensor exactly, and the
    re-imported model computes the same function."""
    model = UNet2D(TINY)
    x = jnp.linspace(-1, 1, 1 * 8 * 8 * 3).reshape(1, 8, 8, 3)
    t = jnp.array([17])
    params = model.init(jax.random.PRNGKey(0), x, t)["params"]

    sd = export_unet_state_dict(jax.tree_util.tree_map(np.asarray, params))
    # Torch-style names present.
    assert any(k.startswith("down_blocks.0.resnets.0.conv1") for k in sd)
    assert any(k.startswith("mid_block.attentions.0.to_q") for k in sd)
    assert "conv_in.weight" in sd and "conv_norm_out.weight" in sd

    back = convert_unet_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    # Every original leaf must exist and match bit-for-bit.
    def get(tree, path):
        node = tree
        for p in path:
            node = node[p.key]
        return node

    n_checked = 0
    for path, leaf in flat_a:
        got = get(back, path)
        np.testing.assert_array_equal(np.asarray(leaf), np.asarray(got), err_msg=str(path))
        n_checked += 1
    assert n_checked > 20

    out_a = model.apply({"params": params}, x, t)
    out_b = model.apply({"params": jax.tree_util.tree_map(jnp.asarray, back)}, x, t)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=0)


def test_legacy_attention_names():
    """Legacy diffusers attention names (query/key/value/proj_attn) map too."""
    model = UNet2D(TINY)
    x = jnp.zeros((1, 8, 8, 3))
    params = model.init(jax.random.PRNGKey(0), x, jnp.zeros((1,), jnp.int32))["params"]
    sd = export_unet_state_dict(jax.tree_util.tree_map(np.asarray, params))
    legacy = {}
    for k, v in sd.items():
        k = k.replace(".to_q.", ".query.").replace(".to_k.", ".key.")
        k = k.replace(".to_v.", ".value.").replace(".to_out.0.", ".proj_attn.")
        legacy[k] = v
    back = convert_unet_state_dict(legacy)
    assert "to_q" in back["mid_attn"]
    np.testing.assert_array_equal(
        np.asarray(params["mid_attn"]["to_q"]["kernel"]),
        back["mid_attn"]["to_q"]["kernel"],
    )


def test_vqvae_export_convert_roundtrip():
    """export_vqvae_state_dict -> convert_vqvae_state_dict is the identity on
    a tiny VQVAE param tree (torch-layout name/shape mapping is exact)."""
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.config.registry import (
        VQVAESpec,
    )
    from group_attribution_for_diffusion_models_tpu.models.convert_diffusers import (
        convert_vqvae_state_dict,
        export_vqvae_state_dict,
    )
    from group_attribution_for_diffusion_models_tpu.models.vqvae import VQVAE

    spec = VQVAESpec(
        sample_size=16, block_out_channels=(8, 16, 16), layers_per_block=1,
        num_vq_embeddings=32, norm_num_groups=4,
    )
    vq = VQVAE(spec)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))["params"]

    sd = export_vqvae_state_dict(jax.tree_util.tree_map(np.asarray, params))
    assert "quantize.embedding.weight" in sd
    assert "encoder.mid_block.attentions.0.to_q.weight" in sd
    assert "decoder.up_blocks.0.upsamplers.0.conv.weight" in sd

    back = convert_vqvae_state_dict(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {jax.tree_util.keystr(k): v
              for k, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(flat_a) == len(flat_b)
    for k, v in flat_a:
        key = jax.tree_util.keystr(k)
        assert key in flat_b, key
        np.testing.assert_array_equal(np.asarray(v), flat_b[key], err_msg=key)

    # Converted tree must run through decode.
    imgs = vq.apply({"params": back},
                    jnp.zeros((1, 4, 4, spec.latent_channels)),
                    method=vq.decode)
    assert imgs.shape == (1, 16, 16, 3)
