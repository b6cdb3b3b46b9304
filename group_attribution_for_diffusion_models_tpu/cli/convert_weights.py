"""Convert locally-downloaded torch checkpoints into this framework's formats.

One entry point for every tower converter (this image has no network egress;
download checkpoints elsewhere, then convert here):

    unet       diffusers UNet2DModel .bin/.safetensors/state-dict .pt
               -> orbax checkpoint dir loadable by cli.main --load
    inception  pytorch_fid InceptionV3 .pt -> .npz variables
    clip_text / clip_vision   HF state dicts -> .npz params
    blip_vision  HF BlipVisionModel state dict -> .npy params (diversity CLI)
    vqvae      diffusers VQModel state dict -> .npy params (cli.main --vqvae_weights)
    aesthetic  LAION linear head .pt -> .npz {kernel, bias}
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def _load_torch_state_dict(path: str):
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return load_file(path)
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "unet" in sd and hasattr(sd["unet"], "items"):
        # reference ckpt_steps_*.pt layout: {"unet": state_dict, ...}
        sd = sd["unet"]
    return {k: np.asarray(v) for k, v in sd.items()}


def _flatten(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--kind", type=str, required=True,
                        choices=["unet", "inception", "clip_text",
                                 "clip_vision", "blip_vision", "vqvae",
                                 "aesthetic", "resnet18", "ldm_bert"])
    parser.add_argument("--src", type=str, required=True,
                        help="torch checkpoint / safetensors file")
    parser.add_argument("--dst", type=str, required=True)
    parser.add_argument("--dataset", type=str, default="cifar",
                        help="unet kind: workload whose spec to validate against")
    return parser.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    sd = _load_torch_state_dict(args.src)

    if args.kind == "unet":
        import jax
        import jax.numpy as jnp

        from ..models import UNet2D
        from ..models.convert_diffusers import convert_unet_state_dict
        from ..training import TrainState, make_optimizer
        from ..utils.ckpt import save_checkpoint
        from .common import config_for

        params = convert_unet_state_dict(sd)
        cfg = config_for(args.dataset)
        model = UNet2D(cfg.unet)
        x0 = jnp.zeros((1, cfg.unet.sample_size, cfg.unet.sample_size,
                        cfg.unet.in_channels))
        ref = model.init(jax.random.PRNGKey(0), x0, jnp.zeros((1,), jnp.int32))["params"]
        ref_shapes = {k: v.shape for k, v in _flatten(ref).items()}
        got_shapes = {k: v.shape for k, v in _flatten(params).items()}
        missing = sorted(set(ref_shapes) - set(got_shapes))
        mismatched = sorted(
            k for k in set(ref_shapes) & set(got_shapes)
            if ref_shapes[k] != got_shapes[k]
        )
        if missing or mismatched:
            raise SystemExit(
                f"conversion does not match the {args.dataset} spec: "
                f"missing={missing[:5]} mismatched={mismatched[:5]}"
            )
        params = jax.tree_util.tree_map(jnp.asarray, params)
        tx = make_optimizer("adam", lr=1e-4)
        save_checkpoint(args.dst, 0, TrainState.create(params, tx),
                        unet_spec=cfg.unet)
        print(f"unet checkpoint -> {args.dst} (step 0)")
        return

    if args.kind == "inception":
        from ..attributions.global_scores.inception_v3 import (
            convert_torch_state_dict,
        )

        variables = convert_torch_state_dict(sd)
        flat = _flatten(variables)
        os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
        np.savez(args.dst, **flat)
    elif args.kind == "clip_text":
        from ..models.clip_text import convert_clip_text_state_dict

        np.savez(args.dst, **_flatten(convert_clip_text_state_dict(sd)))
    elif args.kind == "clip_vision":
        from ..models.clip_vision import convert_clip_vision_state_dict

        np.savez(args.dst, **_flatten(convert_clip_vision_state_dict(sd)))
    elif args.kind == "blip_vision":
        from ..models.blip_vision import convert_blip_vision_state_dict

        os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
        np.save(args.dst, convert_blip_vision_state_dict(sd))
    elif args.kind == "ldm_bert":
        # LDMBertModel (ldm-text2im-large-256 pipeline.bert) -> .npz for
        # cli.main --text_encoder_weights on the imagenette path.
        from ..models.ldm_bert import convert_ldm_bert_state_dict

        os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
        np.savez(args.dst, **_flatten(convert_ldm_bert_state_dict(sd)))
    elif args.kind == "resnet18":
        # torchvision resnet18 state dict -> .npz variables for the
        # cifar100_new regroup pathway (reference src/datasets.py:198-235).
        from ..models.resnet import convert_resnet18_state_dict

        os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
        np.savez(args.dst, **_flatten(convert_resnet18_state_dict(sd)))
    elif args.kind == "vqvae":
        from ..models.convert_diffusers import convert_vqvae_state_dict

        params = convert_vqvae_state_dict(sd)
        # Shape-check against the workload spec before writing.
        import jax
        import jax.numpy as jnp

        from ..models.vqvae import VQVAE
        from .common import config_for

        cfg = config_for(args.dataset)
        if cfg.vqvae is None:
            raise SystemExit(f"{args.dataset} is not a latent workload")
        vq = VQVAE(cfg.vqvae)
        ref = vq.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, cfg.vqvae.sample_size, cfg.vqvae.sample_size,
                       cfg.vqvae.in_channels)),
        )["params"]
        ref_shapes = {k: v.shape for k, v in _flatten(ref).items()}
        got_shapes = {k: v.shape for k, v in _flatten(params).items()}
        missing = sorted(set(ref_shapes) - set(got_shapes))
        mismatched = sorted(k for k in set(ref_shapes) & set(got_shapes)
                            if ref_shapes[k] != got_shapes[k])
        if missing or mismatched:
            raise SystemExit(
                f"vqvae conversion does not match the {args.dataset} spec: "
                f"missing={missing[:5]} mismatched={mismatched[:5]}"
            )
        os.makedirs(os.path.dirname(os.path.abspath(args.dst)), exist_ok=True)
        # .npy pickled dict: the format cli.main --vqvae_weights loads.
        np.save(args.dst, params)
    elif args.kind == "aesthetic":
        # LAION head: Linear(768 -> 1): weight (1, 768), bias (1,).
        w = sd.get("layers.0.weight", sd.get("weight"))
        b = sd.get("layers.0.bias", sd.get("bias"))
        if w is None or b is None:
            raise SystemExit(f"unrecognized aesthetic head keys: {list(sd)[:5]}")
        np.savez(args.dst, kernel=np.asarray(w).T, bias=np.asarray(b))
    print(f"{args.kind} params -> {args.dst}")


if __name__ == "__main__":
    main()
