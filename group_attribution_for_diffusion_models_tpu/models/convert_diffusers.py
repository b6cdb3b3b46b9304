"""diffusers UNet2DModel checkpoint conversion (torch state dict <-> flax).

Lets reference-trained checkpoints (google/ddpm-cifar10-32,
CompVis/ldm-celebahq-256's U-Net, and the reference's own ckpt_steps_*.pt
`unet` entries — reference unconditional_generation/main.py:827-841) load
into this framework's UNet2D, and vice versa for export.

Name mapping (diffusers v0.24 <-> models.unet2d):
    conv_in                                  conv_in
    time_embedding.linear_{1,2}              time_embedding.linear_{1,2}
    down_blocks.I.resnets.J.*                down_I_res_J.*
    down_blocks.I.attentions.J.*             down_I_attn_J.*
    down_blocks.I.downsamplers.0.conv        down_I_downsample.conv
    mid_block.resnets.{0,1}.*                mid_res_{0,1}.*
    mid_block.attentions.0.*                 mid_attn.*
    up_blocks.I.resnets.J.*                  up_I_res_J.*
    up_blocks.I.attentions.J.*               up_I_attn_J.*
    up_blocks.I.upsamplers.0.conv            up_I_upsample.conv
    conv_norm_out / conv_out                 conv_norm_out / conv_out

Attention projections accept both the modern (to_q/to_k/to_v/to_out.0) and
legacy (query/key/value/proj_attn) diffusers names. Torch conv kernels
(O, I, kH, kW) transpose to flax (kH, kW, I, O); Linear (O, I) -> (I, O);
norm weight -> scale.
"""

from __future__ import annotations

import re
from typing import Any, Dict, List

import numpy as np

_ATTN_ALIASES = {
    "query": "to_q",
    "key": "to_k",
    "value": "to_v",
    "proj_attn": "to_out",
    "to_out.0": "to_out",
}

_RESNET_LEAVES = {
    "norm1": "norm1",
    "conv1": "conv1",
    "time_emb_proj": "time_emb_proj",
    "norm2": "norm2",
    "conv2": "conv2",
    "conv_shortcut": "conv_shortcut",
}


def _leaf(value: np.ndarray, torch_leaf: str, module_kind: str):
    """(flax_leaf_name, transformed array) for one torch tensor."""
    v = np.asarray(value)
    if torch_leaf == "weight":
        if v.ndim == 4:  # conv
            return "kernel", v.transpose(2, 3, 1, 0)
        if v.ndim == 2:  # linear
            return "kernel", v.T
        return "scale", v  # norm
    if torch_leaf == "bias":
        return "bias", v
    raise ValueError(f"unexpected leaf {torch_leaf!r}")


def convert_unet_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """torch diffusers UNet2DModel state dict -> flax param tree."""
    params: Dict[str, Any] = {}

    def put(module_path: List[str], leaf: str, v):
        node = params
        for p in module_path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(module_path[-1], {})[leaf] = v

    for key, value in state_dict.items():
        v = np.asarray(value)
        parts = key.split(".")
        torch_leaf = parts[-1]
        if torch_leaf not in ("weight", "bias"):
            continue
        body = parts[:-1]

        if body[:1] == ["conv_in"] or body[:1] == ["conv_out"]:
            leaf, tv = _leaf(v, torch_leaf, "conv")
            put([body[0]], leaf, tv)
        elif body[:1] == ["conv_norm_out"]:
            leaf, tv = _leaf(v, torch_leaf, "norm")
            put(["conv_norm_out"], leaf, tv)
        elif body[:2] in (["time_embedding", "linear_1"], ["time_embedding", "linear_2"]):
            leaf, tv = _leaf(v, torch_leaf, "linear")
            put(["time_embedding", body[1]], leaf, tv)
        elif body[0] in ("down_blocks", "up_blocks", "mid_block"):
            if body[0] == "mid_block":
                kind, rest = body[1], body[2:]
                if kind == "resnets":
                    prefix = f"mid_res_{rest[0]}"
                    sub = rest[1:]
                elif kind == "attentions":
                    prefix = "mid_attn"
                    sub = rest[1:]
                else:
                    continue
            else:
                side = "down" if body[0] == "down_blocks" else "up"
                i, kind, rest = body[1], body[2], body[3:]
                if kind == "resnets":
                    prefix = f"{side}_{i}_res_{rest[0]}"
                    sub = rest[1:]
                elif kind == "attentions":
                    prefix = f"{side}_{i}_attn_{rest[0]}"
                    sub = rest[1:]
                elif kind in ("downsamplers", "upsamplers"):
                    prefix = f"{side}_{i}_{'downsample' if kind == 'downsamplers' else 'upsample'}"
                    sub = rest[1:]  # drop the '0'
                else:
                    continue

            sub_name = ".".join(sub)
            sub_name = _ATTN_ALIASES.get(sub_name, sub_name)
            if sub_name in _RESNET_LEAVES or sub_name in (
                "to_q", "to_k", "to_v", "to_out", "group_norm", "conv",
            ):
                kind2 = (
                    "norm"
                    if sub_name in ("norm1", "norm2", "group_norm")
                    else "linear"
                    if sub_name in ("to_q", "to_k", "to_v", "to_out", "time_emb_proj")
                    else "conv"
                )
                leaf, tv = _leaf(v, torch_leaf, kind2)
                put([prefix, sub_name], leaf, tv)
    return params


def export_unet_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """flax param tree -> torch-layout diffusers UNet2DModel state dict."""
    out: Dict[str, np.ndarray] = {}

    def emit(torch_name: str, leaf: str, v: np.ndarray):
        v = np.asarray(v)
        if leaf == "kernel":
            if v.ndim == 4:
                out[f"{torch_name}.weight"] = v.transpose(3, 2, 0, 1)
            else:
                out[f"{torch_name}.weight"] = v.T
        elif leaf == "scale":
            out[f"{torch_name}.weight"] = v
        else:
            out[f"{torch_name}.bias"] = v

    def torch_module(name: str, sub: str) -> str:
        m = re.match(r"(down|up)_(\d+)_(res|attn)_(\d+)$", name)
        if m:
            side, i, kind, j = m.groups()
            block = "down_blocks" if side == "down" else "up_blocks"
            coll = "resnets" if kind == "res" else "attentions"
            leafname = "to_out.0" if sub == "to_out" else sub
            return f"{block}.{i}.{coll}.{j}.{leafname}"
        m = re.match(r"(down|up)_(\d+)_(downsample|upsample)$", name)
        if m:
            side, i, kind = m.groups()
            block = "down_blocks" if side == "down" else "up_blocks"
            coll = "downsamplers" if kind == "downsample" else "upsamplers"
            return f"{block}.{i}.{coll}.0.{sub}"
        m = re.match(r"mid_res_(\d+)$", name)
        if m:
            return f"mid_block.resnets.{m.group(1)}.{sub}"
        if name == "mid_attn":
            leafname = "to_out.0" if sub == "to_out" else sub
            return f"mid_block.attentions.0.{leafname}"
        if name == "time_embedding":
            return f"time_embedding.{sub}"
        return name  # conv_in / conv_out / conv_norm_out (sub empty)

    for name, module in params.items():
        for sub, leaves in module.items():
            if isinstance(leaves, dict) and any(
                k in leaves for k in ("kernel", "scale", "bias")
            ):
                tname = torch_module(name, sub)
                for leaf, v in leaves.items():
                    emit(tname, leaf, v)
            else:
                # Flat module like conv_in: {kernel, bias} directly.
                tname = torch_module(name, sub)
                if sub in ("kernel", "scale", "bias"):
                    emit(name, sub, leaves)
    return out


def convert_vqvae_state_dict(state_dict: Dict[str, Any]) -> Dict:
    """torch diffusers VQModel state dict -> models.vqvae.VQVAE param tree.

    Layout (diffusers v0.24 vae.py <-> models.vqvae):
        encoder.conv_in                      encoder/conv_in
        encoder.down_blocks.I.resnets.J      encoder/down_I_res_J
        encoder.down_blocks.I.downsamplers.0.conv   encoder/down_I_downsample
        encoder.mid_block.resnets.{0,1}      encoder/mid_res_{0,1}
        encoder.mid_block.attentions.0       encoder/mid_attn
        encoder.conv_norm_out / conv_out     encoder/norm_out / conv_out
        quantize.embedding.weight            codebook
        quant_conv / post_quant_conv         quant_conv / post_quant_conv
        decoder.* (mirrored with up_blocks)  decoder/*
    """
    params: Dict[str, Any] = {}

    def put(path: List[str], leaf: str, v):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node.setdefault(path[-1], {})[leaf] = v

    for key, value in state_dict.items():
        v = np.asarray(value)
        parts = key.split(".")
        if key == "quantize.embedding.weight":
            params["codebook"] = v
            continue
        torch_leaf = parts[-1]
        if torch_leaf not in ("weight", "bias"):
            continue
        body = parts[:-1]

        if body[0] in ("quant_conv", "post_quant_conv"):
            leaf, tv = _leaf(v, torch_leaf, "conv")
            node = params.setdefault(body[0], {})
            node[leaf] = tv
            continue
        if body[0] not in ("encoder", "decoder"):
            continue
        tower, body = body[0], body[1:]

        if body[:1] in (["conv_in"], ["conv_out"]):
            leaf, tv = _leaf(v, torch_leaf, "conv")
            put([tower, body[0]], leaf, tv)
        elif body[:1] == ["conv_norm_out"]:
            leaf, tv = _leaf(v, torch_leaf, "norm")
            put([tower, "norm_out"], leaf, tv)
        elif body[0] in ("down_blocks", "up_blocks", "mid_block"):
            if body[0] == "mid_block":
                kind, rest = body[1], body[2:]
                if kind == "resnets":
                    prefix, sub = f"mid_res_{rest[0]}", rest[1:]
                elif kind == "attentions":
                    prefix, sub = "mid_attn", rest[1:]
                else:
                    continue
            else:
                side = "down" if body[0] == "down_blocks" else "up"
                i, kind, rest = body[1], body[2], body[3:]
                if kind == "resnets":
                    prefix, sub = f"{side}_{i}_res_{rest[0]}", rest[1:]
                elif kind in ("downsamplers", "upsamplers"):
                    prefix = f"{side}_{i}_{'downsample' if kind == 'downsamplers' else 'upsample'}"
                    sub = rest[1:]
                else:
                    continue
            sub_name = _ATTN_ALIASES.get(".".join(sub), ".".join(sub))
            if sub_name in _RESNET_LEAVES or sub_name in (
                "to_q", "to_k", "to_v", "to_out", "group_norm", "conv",
            ):
                kind2 = (
                    "norm" if sub_name in ("norm1", "norm2", "group_norm")
                    else "linear" if sub_name in ("to_q", "to_k", "to_v", "to_out")
                    else "conv"
                )
                # Legacy 1x1-conv attention projections flatten to Dense.
                if kind2 == "linear" and v.ndim == 4:
                    v = v[:, :, 0, 0]
                leaf, tv = _leaf(v, torch_leaf, kind2)
                # VQ encoder/decoder attach the (down|up)sample conv params
                # directly under the module name (nn.Conv, not a wrapper).
                if sub_name == "conv" and prefix.endswith(("downsample", "upsample")):
                    put([tower, prefix], leaf, tv)
                else:
                    put([tower, prefix, sub_name], leaf, tv)
    return params


def export_vqvae_state_dict(params: Dict) -> Dict[str, np.ndarray]:
    """models.vqvae.VQVAE param tree -> torch-layout diffusers VQModel dict."""
    out: Dict[str, np.ndarray] = {}

    def emit(torch_name: str, leaf: str, v: np.ndarray):
        v = np.asarray(v)
        if leaf == "kernel":
            out[f"{torch_name}.weight"] = (
                v.transpose(3, 2, 0, 1) if v.ndim == 4 else v.T
            )
        elif leaf == "scale":
            out[f"{torch_name}.weight"] = v
        else:
            out[f"{torch_name}.bias"] = v

    def torch_module(tower: str, name: str, sub: str) -> str:
        m = re.match(r"(down|up)_(\d+)_res_(\d+)$", name)
        if m:
            side, i, j = m.groups()
            return f"{tower}.{side}_blocks.{i}.resnets.{j}.{sub}"
        m = re.match(r"(down|up)_(\d+)_(downsample|upsample)$", name)
        if m:
            side, i, kind = m.groups()
            coll = "downsamplers" if kind == "downsample" else "upsamplers"
            return f"{tower}.{side}_blocks.{i}.{coll}.0.conv"
        m = re.match(r"mid_res_(\d+)$", name)
        if m:
            return f"{tower}.mid_block.resnets.{m.group(1)}.{sub}"
        if name == "mid_attn":
            leafname = "to_out.0" if sub == "to_out" else sub
            return f"{tower}.mid_block.attentions.0.{leafname}"
        if name == "norm_out":
            return f"{tower}.conv_norm_out"
        return f"{tower}.{name}"

    for top, module in params.items():
        if top == "codebook":
            out["quantize.embedding.weight"] = np.asarray(module)
            continue
        if top in ("quant_conv", "post_quant_conv"):
            for leaf, v in module.items():
                emit(top, leaf, v)
            continue
        for name, sub_tree in module.items():
            if any(k in sub_tree for k in ("kernel", "scale", "bias")):
                # leaf module attached directly (conv_in, downsample convs...)
                for leaf, v in sub_tree.items():
                    emit(torch_module(top, name, ""), leaf, v)
            else:
                for sub, leaves in sub_tree.items():
                    for leaf, v in leaves.items():
                        emit(torch_module(top, name, sub), leaf, v)
    return out
