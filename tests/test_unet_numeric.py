"""Numeric parity: UNet2D + convert_unet_state_dict vs a torch re-creation
of diffusers' UNet2DModel on shared random weights.

diffusers is not in this image, so the oracle below re-creates the
UNet2DModel forward for a tiny unconditional config exactly as diffusers
v0.24 executes it (the architecture the reference trains,
src/ddpm_config.py:48-82): sinusoidal time embedding -> 2-layer MLP,
ResnetBlock2D (GN-SiLU-conv with additive SiLU'd time projection),
single-head residual attention with GroupNorm, asymmetric-padding stride-2
downsample (downsample_padding=0), nearest-neighbor upsample, diffusers skip
wiring (push after conv_in / each resnet-attn / each downsample), GN-SiLU
conv_out. State-dict names match diffusers so convert_unet_state_dict maps
them; outputs must agree. This is the checkpoint-import fidelity test
SURVEY.md §7 calls the classic silent killer.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional


class TorchResnet(torch.nn.Module):
    def __init__(self, in_ch, out_ch, temb_ch, groups=4, eps=1e-6):
        super().__init__()
        self.norm1 = torch.nn.GroupNorm(groups, in_ch, eps=eps)
        self.conv1 = torch.nn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = torch.nn.Linear(temb_ch, out_ch)
        self.norm2 = torch.nn.GroupNorm(groups, out_ch, eps=eps)
        self.conv2 = torch.nn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (
            torch.nn.Conv2d(in_ch, out_ch, 1) if in_ch != out_ch else None
        )

    def forward(self, x, temb):
        h = self.conv1(F.silu(self.norm1(x)))
        h = h + self.time_emb_proj(F.silu(temb))[:, :, None, None]
        h = self.conv2(F.silu(self.norm2(h)))
        if self.conv_shortcut is not None:
            x = self.conv_shortcut(x)
        return x + h


class TorchAttention(torch.nn.Module):
    """Single-head residual attention (UNet2DModel attention_head_dim=None)."""

    def __init__(self, ch, groups=4, eps=1e-6):
        super().__init__()
        self.group_norm = torch.nn.GroupNorm(groups, ch, eps=eps)
        self.to_q = torch.nn.Linear(ch, ch)
        self.to_k = torch.nn.Linear(ch, ch)
        self.to_v = torch.nn.Linear(ch, ch)
        self.to_out = torch.nn.ModuleList([torch.nn.Linear(ch, ch)])

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).reshape(b, c, h * w).transpose(1, 2)  # (b, hw, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = torch.softmax(q @ k.transpose(1, 2) * c**-0.5, dim=-1)
        y = self.to_out[0](attn @ v)
        return x + y.transpose(1, 2).reshape(b, c, h, w)


class TorchDownsample(torch.nn.Module):
    def __init__(self, ch, padding=0):
        super().__init__()
        self.padding = padding
        self.conv = torch.nn.Conv2d(ch, ch, 3, stride=2, padding=padding)

    def forward(self, x):
        if self.padding == 0:
            x = F.pad(x, (0, 1, 0, 1))  # diffusers' asymmetric pad
        return self.conv(x)


class TorchUpsample(torch.nn.Module):
    def __init__(self, ch):
        super().__init__()
        self.conv = torch.nn.Conv2d(ch, ch, 3, padding=1)

    def forward(self, x):
        return self.conv(F.interpolate(x, scale_factor=2.0, mode="nearest"))


def _timestep_embedding(t, dim, flip_sin_to_cos=False, freq_shift=1.0):
    half = dim // 2
    exponent = -np.log(10000.0) * torch.arange(half, dtype=torch.float32)
    exponent = exponent / (half - freq_shift)
    emb = t.float()[:, None] * torch.exp(exponent)[None]
    emb = torch.cat([torch.sin(emb), torch.cos(emb)], dim=-1)
    if flip_sin_to_cos:
        emb = torch.cat([emb[:, half:], emb[:, :half]], dim=-1)
    return emb


class TorchTinyUNet(torch.nn.Module):
    """diffusers UNet2DModel for block_out_channels=(8, 16),
    down=(DownBlock2D, AttnDownBlock2D), up=(AttnUpBlock2D, UpBlock2D),
    layers_per_block=1, norm_num_groups=4, downsample_padding=0."""

    def __init__(self):
        super().__init__()
        c0, c1 = 8, 16
        temb = c0 * 4
        self.conv_in = torch.nn.Conv2d(3, c0, 3, padding=1)
        self.time_embedding = torch.nn.Module()
        self.time_embedding.linear_1 = torch.nn.Linear(c0, temb)
        self.time_embedding.linear_2 = torch.nn.Linear(temb, temb)

        d0 = torch.nn.Module()
        d0.resnets = torch.nn.ModuleList([TorchResnet(c0, c0, temb)])
        d0.downsamplers = torch.nn.ModuleList([TorchDownsample(c0)])
        d1 = torch.nn.Module()
        d1.resnets = torch.nn.ModuleList([TorchResnet(c0, c1, temb)])
        d1.attentions = torch.nn.ModuleList([TorchAttention(c1)])
        self.down_blocks = torch.nn.ModuleList([d0, d1])

        self.mid_block = torch.nn.Module()
        self.mid_block.resnets = torch.nn.ModuleList(
            [TorchResnet(c1, c1, temb), TorchResnet(c1, c1, temb)]
        )
        self.mid_block.attentions = torch.nn.ModuleList([TorchAttention(c1)])

        u0 = torch.nn.Module()
        u0.resnets = torch.nn.ModuleList(
            [TorchResnet(c1 + c1, c1, temb), TorchResnet(c1 + c0, c1, temb)]
        )
        u0.attentions = torch.nn.ModuleList([TorchAttention(c1), TorchAttention(c1)])
        u0.upsamplers = torch.nn.ModuleList([TorchUpsample(c1)])
        u1 = torch.nn.Module()
        u1.resnets = torch.nn.ModuleList(
            [TorchResnet(c1 + c0, c0, temb), TorchResnet(c0 + c0, c0, temb)]
        )
        self.up_blocks = torch.nn.ModuleList([u0, u1])

        self.conv_norm_out = torch.nn.GroupNorm(4, c0, eps=1e-6)
        self.conv_out = torch.nn.Conv2d(c0, 3, 3, padding=1)

    def forward(self, x, t):
        temb = self.time_embedding.linear_2(
            F.silu(self.time_embedding.linear_1(_timestep_embedding(t, 8)))
        )
        h = self.conv_in(x)
        skips = [h]
        # down 0 (DownBlock2D)
        h = self.down_blocks[0].resnets[0](h, temb)
        skips.append(h)
        h = self.down_blocks[0].downsamplers[0](h)
        skips.append(h)
        # down 1 (AttnDownBlock2D, final: no downsample)
        h = self.down_blocks[1].attentions[0](self.down_blocks[1].resnets[0](h, temb))
        skips.append(h)
        # mid
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, temb)
        # up 0 (AttnUpBlock2D)
        for j in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self.up_blocks[0].attentions[j](self.up_blocks[0].resnets[j](h, temb))
        h = self.up_blocks[0].upsamplers[0](h)
        # up 1 (UpBlock2D, final: no upsample)
        for j in range(2):
            h = torch.cat([h, skips.pop()], dim=1)
            h = self.up_blocks[1].resnets[j](h, temb)
        return self.conv_out(F.silu(self.conv_norm_out(h)))


TINY_SPEC_KW = dict(
    sample_size=8,
    block_out_channels=(8, 16),
    down_block_types=("DownBlock2D", "AttnDownBlock2D"),
    up_block_types=("AttnUpBlock2D", "UpBlock2D"),
    layers_per_block=1,
    norm_num_groups=4,
)


def test_unet_converter_matches_torch_forward():
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.config import UNetSpec
    from group_attribution_for_diffusion_models_tpu.models import UNet2D
    from group_attribution_for_diffusion_models_tpu.models.convert_diffusers import (
        convert_unet_state_dict,
    )

    torch.manual_seed(0)
    oracle = TorchTinyUNet().eval()

    rng = np.random.RandomState(2)
    x = rng.uniform(-1, 1, size=(2, 8, 8, 3)).astype(np.float32)
    t = np.array([3, 777], np.int64)
    with torch.no_grad():
        want = oracle(
            torch.tensor(x.transpose(0, 3, 1, 2)), torch.tensor(t)
        ).numpy().transpose(0, 2, 3, 1)

    model = UNet2D(UNetSpec(**TINY_SPEC_KW))
    params = convert_unet_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = np.asarray(
        model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t))
    )
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_unet_export_roundtrip():
    """export_unet_state_dict inverts convert_unet_state_dict bit-exactly."""
    from group_attribution_for_diffusion_models_tpu.models.convert_diffusers import (
        convert_unet_state_dict,
        export_unet_state_dict,
    )

    torch.manual_seed(1)
    sd = {k: v.numpy() for k, v in TorchTinyUNet().state_dict().items()}
    exported = export_unet_state_dict(convert_unet_state_dict(sd))
    assert set(exported) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(exported[k], sd[k], err_msg=k)
