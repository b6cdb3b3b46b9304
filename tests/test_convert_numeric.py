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


class _TorchLDMBertAttention(torch.nn.Module):
    """diffusers v0.24 LDMBertAttention: inner = heads*head_dim, bias-free
    q/k/v, out_proj back to d_model (pipeline_latent_diffusion.py)."""

    def __init__(self, d_model, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.q_proj = torch.nn.Linear(d_model, inner, bias=False)
        self.k_proj = torch.nn.Linear(d_model, inner, bias=False)
        self.v_proj = torch.nn.Linear(d_model, inner, bias=False)
        self.out_proj = torch.nn.Linear(inner, d_model)

    def forward(self, x):
        b, s, _ = x.shape
        shp = (b, s, self.heads, self.head_dim)
        q = self.q_proj(x).view(shp) * self.head_dim ** -0.5
        k = self.k_proj(x).view(shp)
        v = self.v_proj(x).view(shp)
        att = torch.einsum("bqhd,bkhd->bhqk", q, k).softmax(dim=-1)
        out = torch.einsum("bhqk,bkhd->bqhd", att, v).reshape(b, s, -1)
        return self.out_proj(out)


class _TorchLDMBertLayer(torch.nn.Module):
    def __init__(self, d_model, heads, head_dim, ffn):
        super().__init__()
        self.self_attn = _TorchLDMBertAttention(d_model, heads, head_dim)
        self.self_attn_layer_norm = torch.nn.LayerNorm(d_model)
        self.fc1 = torch.nn.Linear(d_model, ffn)
        self.fc2 = torch.nn.Linear(ffn, d_model)
        self.final_layer_norm = torch.nn.LayerNorm(d_model)

    def forward(self, x):
        x = self.self_attn_layer_norm(x + self.self_attn(x))
        h = self.fc2(torch.nn.functional.gelu(self.fc1(x)))
        return self.final_layer_norm(x + h)


class _TorchLDMBert(torch.nn.Module):
    """LDMBertModel state-dict layout: everything under ``model.``, plus an
    unused to_logits head (dropped by the converter)."""

    def __init__(self, vocab, max_pos, d_model, layers, heads, head_dim, ffn):
        super().__init__()
        encoder = torch.nn.Module()
        encoder.embed_tokens = torch.nn.Embedding(vocab, d_model)
        encoder.embed_positions = torch.nn.Embedding(max_pos, d_model)
        encoder.layers = torch.nn.ModuleList(
            _TorchLDMBertLayer(d_model, heads, head_dim, ffn)
            for _ in range(layers)
        )
        encoder.layer_norm = torch.nn.LayerNorm(d_model)
        self.model = encoder
        self.to_logits = torch.nn.Linear(d_model, vocab)

    def forward(self, ids):
        m = self.model
        h = m.embed_tokens(ids) + m.embed_positions.weight[None, : ids.shape[1]]
        for layer in m.layers:
            h = layer(h)
        return m.layer_norm(h)


def test_ldm_bert_converter_matches_torch_forward():
    """Flax LDMBertEncoder == the diffusers LDMBert graph on shared weights
    (width-scaled; the layout map is width-agnostic). Note the LDM quirk:
    attention inner width (heads*head_dim) != d_model."""
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.ldm_bert import (
        LDMBertEncoder,
        convert_ldm_bert_state_dict,
    )

    vocab, max_pos, d_model, layers, heads, head_dim, ffn = 64, 16, 24, 3, 2, 4, 48
    torch.manual_seed(0)
    oracle = _TorchLDMBert(vocab, max_pos, d_model, layers, heads, head_dim, ffn)
    oracle.eval()

    params = convert_ldm_bert_state_dict(oracle.state_dict())
    model = LDMBertEncoder(
        vocab_size=vocab, max_positions=max_pos, d_model=d_model, layers=layers,
        num_heads=heads, head_dim=head_dim, ffn_dim=ffn,
    )

    ids = np.random.RandomState(0).randint(0, vocab, size=(3, 12))
    with torch.no_grad():
        want = oracle(torch.from_numpy(ids)).numpy()
    got = np.asarray(model.apply({"params": params}, jnp.asarray(ids)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_ldm_bert_default_config_param_count():
    """Default spec == ldm-text2im-large-256's bert: 32 post-LN layers at
    d_model 1280 with 512-wide attention; pins the parameter count so a
    config drift is caught without the real checkpoint."""
    from group_attribution_for_diffusion_models_tpu.models.ldm_bert import (
        LDMBertEncoder,
    )

    spec = LDMBertEncoder()
    d, inner, ffn = spec.d_model, spec.num_heads * spec.head_dim, spec.ffn_dim
    per_layer = (
        3 * d * inner            # q/k/v (bias-free)
        + inner * d + d          # out_proj
        + 2 * (2 * d)            # two LayerNorms
        + d * ffn + ffn          # fc1
        + ffn * d + d            # fc2
    )
    want = (
        spec.vocab_size * d + spec.max_positions * d
        + spec.layers * per_layer + 2 * d
    )
    import jax
    import jax.numpy as jnp

    # Count from a 2-layer instance and extrapolate (32 full layers would be
    # slow to init in CI); layer params are homogeneous.
    small = LDMBertEncoder(layers=2)
    variables = small.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))
    n_small = sum(x.size for x in jax.tree_util.tree_leaves(variables))
    n_extrapolated = n_small + (spec.layers - 2) * per_layer
    assert n_extrapolated == want
