"""Numerical converter parity against real torch towers (transformers).

The round-trip tests in test_convert_* check structure; these check VALUES:
a randomly initialized HF CLIP text/vision model is converted with our state-
dict converters and must produce the same outputs as the torch forward pass —
the fidelity trap SURVEY.md §7 flags for the behavior scorers (this image has
no pretrained checkpoints, but parity on random weights transfers to real
ones because the converters are weight-layout maps, not value transforms).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_clip_text_converter_matches_torch_forward():
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.clip_text import (
        CLIPTextEncoder,
        convert_clip_text_state_dict,
    )

    cfg = transformers.CLIPTextConfig(
        vocab_size=101, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=128,
        max_position_embeddings=77, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPTextModel(cfg).eval()

    ids = np.array([[49 % 101, 3, 7, 11, 2] + [1] * 7], np.int64)
    with torch.no_grad():
        want = hf(torch.tensor(ids)).last_hidden_state.numpy()

    ours = CLIPTextEncoder(vocab_size=101, width=32, layers=2, heads=2)
    params = convert_clip_text_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}
    )
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_clip_vision_converter_matches_torch_forward():
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.clip_vision import (
        CLIP_MEAN,
        CLIP_STD,
        CLIPVisionEncoder,
        convert_clip_vision_state_dict,
    )

    cfg = transformers.CLIPVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=128, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModelWithProjection(cfg).eval()

    rng = np.random.RandomState(0)
    imgs01 = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    # Our model resizes (no-op at 32x32) and normalizes internally; hand the
    # torch model the equivalent preprocessed NCHW pixel values.
    pixel_values = ((imgs01 - CLIP_MEAN) / CLIP_STD).transpose(0, 3, 1, 2)
    with torch.no_grad():
        want = hf(torch.tensor(pixel_values)).image_embeds.numpy()

    ours = CLIPVisionEncoder(
        image_size=32, patch_size=8, width=32, layers=2, heads=2, proj_dim=16
    )
    params = convert_clip_vision_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}
    )
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(imgs01)))
    np.testing.assert_allclose(got, want, atol=3e-5, rtol=3e-5)


def test_blip_vision_converter_matches_torch_forward():
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.blip_vision import (
        BlipVisionTower,
        convert_blip_vision_state_dict,
    )
    from group_attribution_for_diffusion_models_tpu.models.clip_vision import (
        CLIP_MEAN,
        CLIP_STD,
    )

    cfg = transformers.BlipVisionConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=32, patch_size=8,
    )
    torch.manual_seed(0)
    hf = transformers.BlipVisionModel(cfg).eval()

    rng = np.random.RandomState(1)
    imgs01 = rng.uniform(0, 1, size=(2, 32, 32, 3)).astype(np.float32)
    pixel_values = ((imgs01 - CLIP_MEAN) / CLIP_STD).transpose(0, 3, 1, 2)
    with torch.no_grad():
        want = hf(torch.tensor(pixel_values)).pooler_output.numpy()

    ours = BlipVisionTower(image_size=32, patch_size=8, width=32, layers=2,
                           heads=2, mlp_dim=64)
    params = convert_blip_vision_state_dict(
        {k: v.numpy() for k, v in hf.state_dict().items()}
    )
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(imgs01)))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-3)


def test_aesthetic_head_torch_state_dict():
    """The LAION aesthetic probe (nn.Linear(768,1) on the normalized CLIP
    embedding, reference src/aesthetics.py:8-27) loads from its original
    torch .pth layout and matches the torch forward."""
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.clip_vision import (
        load_aesthetic_head,
    )

    torch.manual_seed(0)
    lin = torch.nn.Linear(768, 1).eval()
    import tempfile, os

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "sa_0_4_vit_l_14_linear.pth")
        torch.save(lin.state_dict(), path)
        head, variables = load_aesthetic_head(path)

    emb = np.random.RandomState(0).normal(size=(3, 768)).astype(np.float32)
    t = torch.tensor(emb)
    with torch.no_grad():
        want = lin(t / t.norm(dim=-1, keepdim=True)).numpy()[:, 0]
    got = np.asarray(head.apply(variables, jnp.asarray(emb)))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)

    # Wrong-dimension weights fail loudly.
    import pytest as _pytest

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "bad.pth")
        torch.save(torch.nn.Linear(512, 1).state_dict(), path)
        with _pytest.raises(ValueError, match="768"):
            load_aesthetic_head(path)
