"""Native batched image loader vs PIL (decode correctness + dataset wiring)."""

import os
import time

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.utils.native_images import (
    load_image_batch,
)


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.RandomState(0)
    paths = []
    for i in range(6):
        arr = rng.randint(0, 256, size=(48, 40, 3), dtype=np.int64).astype(np.uint8)
        ext = "png" if i % 2 == 0 else "jpg"
        p = str(d / f"img_{i}.{ext}")
        Image.fromarray(arr).save(p, quality=95)
        paths.append(p)
    # One exact-size image for bit-exact comparison.
    exact = rng.randint(0, 256, size=(32, 32, 3), dtype=np.int64).astype(np.uint8)
    pe = str(d / "exact.png")
    Image.fromarray(exact).save(pe)
    return paths, pe, exact


def test_native_loader_available_and_exact_size(image_dir):
    paths, pe, exact = image_dir
    out = load_image_batch([pe], 32)
    if out is None:
        pytest.skip("native loader unavailable (no toolchain)")
    # PNG decode with no resize must be bit-exact.
    np.testing.assert_array_equal(out[0], exact)


def test_native_loader_close_to_pil(image_dir):
    from PIL import Image

    paths, _, _ = image_dir
    out = load_image_batch(paths, 24)
    if out is None:
        pytest.skip("native loader unavailable")
    assert out.shape == (6, 24, 24, 3)
    for i, p in enumerate(paths):
        with Image.open(p) as im:
            want = np.asarray(
                im.convert("RGB").resize((24, 24), Image.BILINEAR), np.uint8
            )
        diff = np.abs(out[i].astype(int) - want.astype(int))
        # Same support-scaled triangle filter as PIL; only rounding differs.
        assert diff.max() <= 1, diff.max()


def test_native_loader_errors(image_dir, tmp_path):
    paths, _, _ = image_dir
    if load_image_batch(paths[:1], 8) is None:
        pytest.skip("native loader unavailable")
    with pytest.raises(FileNotFoundError):
        load_image_batch([str(tmp_path / "missing.png")], 8)
    bad = str(tmp_path / "bad.png")
    open(bad, "wb").write(b"\x89Pnotapng")
    with pytest.raises(ValueError):
        load_image_batch([bad], 8)


def test_image_dir_dataset_uses_native(image_dir, tmp_path):
    """_load_image_dir returns identical structure through either path."""
    from PIL import Image

    from group_attribution_for_diffusion_models_tpu.data.datasets import (
        _load_image_dir,
    )

    rng = np.random.RandomState(1)
    d = tmp_path / "ds"
    d.mkdir()
    for i in range(4):
        arr = rng.randint(0, 256, size=(16, 16, 3), dtype=np.int64).astype(np.uint8)
        Image.fromarray(arr).save(d / f"x_{i}.png")
    ds = _load_image_dir(str(d), 16)
    assert ds.images.shape == (4, 16, 16, 3)
    assert -1.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert ds.names == [f"x_{i}.png" for i in range(4)]


def test_image_dir_falls_back_to_pil_for_webp(tmp_path):
    """Formats the native decoder lacks (webp) fall back to the PIL loop
    instead of crashing the dataset load."""
    from PIL import Image

    from group_attribution_for_diffusion_models_tpu.data.datasets import (
        _load_image_dir,
    )

    rng = np.random.RandomState(2)
    d = tmp_path / "mixed"
    d.mkdir()
    for i in range(2):
        arr = rng.randint(0, 256, size=(16, 16, 3), dtype=np.int64).astype(np.uint8)
        Image.fromarray(arr).save(d / f"w_{i}.webp")
    ds = _load_image_dir(str(d), 16)
    assert ds.images.shape == (2, 16, 16, 3)
