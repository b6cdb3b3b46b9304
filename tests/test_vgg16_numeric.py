"""Numeric parity: Flax VGG16 P&R tower vs a torch oracle on shared weights.

The reference's precision/recall features come from the StyleGAN2 VGG16
(reference precision_recall.py:31-51) — architecturally the classic VGG16
with fc2 features. The oracle below builds that tower in plain torch with
torchvision's state-dict naming (features.N / classifier.N), so
convert_vgg16_state_dict is exercised on the exact layout real weights use.
A width-scaled config keeps the test fast; the layout map is width-agnostic.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
F = torch.nn.functional

STAGES = ((6, 6), (12,), (24, 24))
FC = 32
SIZE = 16


def _torch_vgg(stages, fc_dim, in_size):
    layers = []
    in_ch = 3
    for stage in stages:
        for ch in stage:
            layers += [torch.nn.Conv2d(in_ch, ch, 3, padding=1), torch.nn.ReLU()]
            in_ch = ch
        layers.append(torch.nn.MaxPool2d(2, 2))
    features = torch.nn.Sequential(*layers)
    spatial = in_size // (2 ** len(stages))
    classifier = torch.nn.Sequential(
        torch.nn.Linear(in_ch * spatial * spatial, fc_dim),
        torch.nn.ReLU(),
        torch.nn.Identity(),
        torch.nn.Linear(fc_dim, fc_dim),
    )
    model = torch.nn.Module()
    model.features = features
    model.classifier = classifier

    def forward(x):
        h = features(x)
        return classifier(torch.flatten(h, 1))

    model.forward = forward
    return model


@pytest.mark.parametrize("preprocess", ["caffe", "torchvision", "none"])
def test_vgg16_converter_matches_torch_forward(preprocess):
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.attributions.global_scores.vgg16 import (
        _CAFFE_MEAN,
        _TV_MEAN,
        _TV_STD,
        VGG16Features,
        convert_vgg16_state_dict,
    )

    torch.manual_seed(0)
    oracle = _torch_vgg(STAGES, FC, SIZE).eval()

    rng = np.random.RandomState(3)
    imgs = rng.uniform(0, 1, size=(2, SIZE, SIZE, 3)).astype(np.float32)
    xin = imgs
    if preprocess == "caffe":
        xin = imgs * 255.0 - _CAFFE_MEAN
    elif preprocess == "torchvision":
        xin = (imgs - _TV_MEAN) / _TV_STD
    with torch.no_grad():
        want = oracle.forward(
            torch.tensor(xin.transpose(0, 3, 1, 2))
        ).numpy()

    model = VGG16Features(
        stages=STAGES, fc_dim=FC, input_size=SIZE, preprocess=preprocess
    )
    params = convert_vgg16_state_dict(
        {k: v.numpy() for k, v in oracle.state_dict().items()}
    )
    params = jax.tree_util.tree_map(jnp.asarray, params)
    got = np.asarray(model.apply({"params": params}, jnp.asarray(imgs)))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=2e-4)


def test_vgg16_full_conv_key_mapping():
    """The real torchvision vgg16 conv indices (0,2,5,...,28) map in order
    to conv_0..conv_12 with the right shapes."""
    from group_attribution_for_diffusion_models_tpu.attributions.global_scores.vgg16 import (
        VGG16_STAGES,
        convert_vgg16_state_dict,
    )

    tv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    widths = [w for stage in VGG16_STAGES for w in stage]
    ins = [3] + widths[:-1]
    sd = {}
    for i, (tk, w, cin) in enumerate(zip(tv_idx, widths, ins)):
        sd[f"features.{tk}.weight"] = np.zeros((w, cin, 3, 3), np.float32) + i
        sd[f"features.{tk}.bias"] = np.zeros((w,), np.float32)
    sd["classifier.0.weight"] = np.zeros((4096, 512 * 7 * 7), np.float32)
    sd["classifier.0.bias"] = np.zeros((4096,), np.float32)
    sd["classifier.3.weight"] = np.zeros((4096, 4096), np.float32)
    sd["classifier.3.bias"] = np.zeros((4096,), np.float32)
    sd["classifier.6.weight"] = np.zeros((1000, 4096), np.float32)  # dropped
    sd["classifier.6.bias"] = np.zeros((1000,), np.float32)

    params = convert_vgg16_state_dict(sd)
    assert set(params) == {f"conv_{i}" for i in range(13)} | {"fc1", "fc2"}
    for i, (w, cin) in enumerate(zip(widths, ins)):
        assert params[f"conv_{i}"]["kernel"].shape == (3, 3, cin, w)
        assert float(params[f"conv_{i}"]["kernel"][0, 0, 0, 0]) == i
    assert params["fc1"]["kernel"].shape == (512 * 7 * 7, 4096)


def test_pr_cli_with_vgg16_extractor(tmp_path):
    """calculate_global_scores --pr_extractor vgg16 end-to-end on synthetic
    data with the tiny tower."""
    import json
    import os

    from group_attribution_for_diffusion_models_tpu.cli import (
        calculate_global_scores as cgs,
    )

    # A tiny sample dir of PNGs.
    from PIL import Image

    sample_dir = tmp_path / "samples"
    sample_dir.mkdir()
    rng = np.random.RandomState(0)
    for i in range(4):
        arr = (rng.uniform(0, 1, size=(8, 8, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(sample_dir / f"s_{i}.png")

    db = tmp_path / "db.jsonl"
    cgs.main([
        "--dataset", "synthetic_64x8", "--sample_dir", str(sample_dir),
        "--n_samples", "4", "--outdir", str(tmp_path), "--db", str(db),
        "--pr_extractor", "vgg16", "--pr_vgg_tiny", "--batch_size", "8",
    ])
    row = json.loads(db.read_text().strip().splitlines()[-1])
    assert row["precision"] is not None and 0.0 <= row["precision"] <= 1.0
    assert row["recall"] is not None and 0.0 <= row["recall"] <= 1.0
