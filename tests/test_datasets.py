"""Dataset registry against fabricated archives in standard binary formats.

The reference relies on torchvision downloads (reference src/datasets.py);
here the loaders parse the raw formats directly, so these tests write tiny
valid CIFAR pickles / MNIST idx files / image dirs and check the filter and
relabel semantics (CIFAR2 :22-56, CIFAR100_original :59-118,
CIFAR100_filter :273-310, CelebA :313-347).
"""

import os
import pickle
import struct

import numpy as np
import pytest

from group_attribution_for_diffusion_models_tpu.data.datasets import (
    CIFAR2_CLASSES,
    CIFAR100_ANIMAL_SUPERCLASSES,
    cifar100_regroup,
    create_dataset,
)


@pytest.fixture(scope="module")
def fake_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("datasets")
    rng = np.random.RandomState(0)

    # CIFAR-10: 5 train batches, 20 images each, labels cycling 0..9.
    c10 = root / "cifar-10-batches-py"
    c10.mkdir()
    for b in range(1, 6):
        data = rng.randint(0, 256, size=(20, 3072), dtype=np.int64).astype(np.uint8)
        labels = [(i + b) % 10 for i in range(20)]
        with open(c10 / f"data_batch_{b}", "wb") as f:
            pickle.dump({"data": data, "labels": labels}, f)

    # CIFAR-100: one train file, 300 images covering all 100 fine labels 3x.
    c100 = root / "cifar-100-python"
    c100.mkdir()
    data = rng.randint(0, 256, size=(300, 3072), dtype=np.int64).astype(np.uint8)
    fine = [i % 100 for i in range(300)]
    with open(c100 / "train", "wb") as f:
        pickle.dump({"data": data, "fine_labels": fine}, f)

    # MNIST idx: 10 images 28x28.
    mn = root / "MNIST" / "raw"
    mn.mkdir(parents=True)
    imgs = rng.randint(0, 256, size=(10, 28, 28), dtype=np.int64).astype(np.uint8)
    with open(mn / "train-images-idx3-ubyte", "wb") as f:
        f.write(struct.pack(">IIII", 2051, 10, 28, 28) + imgs.tobytes())
    with open(mn / "train-labels-idx1-ubyte", "wb") as f:
        f.write(struct.pack(">II", 2049, 10) + bytes(range(10)))

    # CelebA-HQ: 6 images + labels.csv with 3 celebs.
    from PIL import Image

    cel = root / "celeba_hq" / "train"
    cel.mkdir(parents=True)
    lines = ["filename,celeb"]
    for i in range(6):
        arr = rng.randint(0, 256, size=(64, 64, 3), dtype=np.int64).astype(np.uint8)
        name = f"img_{i}.png"
        Image.fromarray(arr).save(cel / name)
        lines.append(f"{name},celeb_{i % 3}")
    (cel / "labels.csv").write_text("\n".join(lines) + "\n")

    return str(root)


def test_cifar10_normalization(fake_root):
    ds = create_dataset("cifar", dataset_dir=fake_root)
    assert ds.images.shape == (100, 32, 32, 3)
    assert -1.0 <= ds.images.min() and ds.images.max() <= 1.0
    assert ds.num_classes == 10


def test_cifar2_filters_and_relabels(fake_root):
    full = create_dataset("cifar", dataset_dir=fake_root)
    ds = create_dataset("cifar2", dataset_dir=fake_root)
    want = int(np.isin(full.labels, CIFAR2_CLASSES).sum())
    assert len(ds) == want
    assert set(np.unique(ds.labels)) == {0, 1}


def test_cifar100_animal_filter(fake_root):
    ds = create_dataset("cifar100", dataset_dir=fake_root)
    # 20 animal fine classes x 3 occurrences each in the fabricated set.
    assert len(ds) == 60
    assert ds.num_classes == 20
    assert set(np.unique(ds.labels)) == set(range(20))
    n_animal = sum(len(v) for v in CIFAR100_ANIMAL_SUPERCLASSES.values())
    assert n_animal == 20


def test_cifar100_imbalanced_filter(fake_root):
    ds = create_dataset("cifar100_f", dataset_dir=fake_root)
    # Class k keeps min(3, 2*(k+1)) of its 3 fabricated examples: class 0
    # keeps 2, every other class keeps all 3.
    counts = np.bincount(ds.labels, minlength=100)
    assert counts[0] == 2
    assert (counts[1:] == 3).all()


def test_mnist_pads_to_32(fake_root):
    ds = create_dataset("mnist", dataset_dir=fake_root)
    assert ds.images.shape == (10, 32, 32, 1)
    # Pad value is -1 (black in [-1,1] space).
    assert (ds.images[:, :2, :, :] == -1.0).all()


def test_celeba_groups_from_csv(fake_root):
    ds = create_dataset("celeba", dataset_dir=fake_root)
    assert ds.images.shape == (6, 256, 256, 3)
    assert ds.num_classes == 3
    assert ds.names is not None and ds.names[0] == "img_0.png"


def test_cifar100_regroup_clusters_per_image():
    """Per-IMAGE k-means (reference apply_clustering, src/datasets.py:198-235):
    images sharing a feature cluster land in one pseudo-group, regardless of
    original class boundaries."""
    rng = np.random.RandomState(0)
    labels = np.repeat(np.arange(8), 5)
    centers = np.repeat(np.eye(4) * 10.0, 2, axis=0)  # classes 2k,2k+1 share
    feats = centers[labels] + rng.normal(scale=0.01, size=(40, 4))
    groups = cifar100_regroup(feats, num_groups=4, seed=0)
    assert groups.shape == (40,)
    by_class = {c: groups[labels == c][0] for c in range(8)}
    for c in range(0, 8, 2):
        assert by_class[c] == by_class[c + 1]
    assert len({v for v in by_class.values()}) == 4
    for c in range(8):
        assert len(set(groups[labels == c])) == 1


def test_textured_synthetic_classes_differ_spectrally():
    """The _tex variant separates classes by spatial smoothness (survives
    the GroupNorm layers of a VAE encoder, unlike amplitude scaling)."""
    from group_attribution_for_diffusion_models_tpu.data import create_dataset

    ds = create_dataset("synthetic_512x16_tex")

    def lag1(sub):
        return float(np.mean(sub[:, :, :-1] * sub[:, :, 1:]) / sub.var())

    smooth = lag1(ds.images[ds.labels == 3])   # box width 4
    rough = lag1(ds.images[ds.labels == 0])    # box width 1 (untouched)
    assert rough < 0.1 < 0.5 < smooth
    # Amplitude stays class-independent: the signal is spectral only.
    s0 = ds.images[ds.labels == 0].std()
    s3 = ds.images[ds.labels == 3].std()
    assert abs(s0 - s3) / s0 < 0.25


def test_templated_synthetic_classes_do_not_interpolate():
    """The _tpl variant concentrates class k on a fixed template: high
    within-class correlation, zero cross-class correlation — the
    non-interpolable class structure attribution-quality demos need
    (a model trained without class k cannot denoise class-k probes)."""
    from group_attribution_for_diffusion_models_tpu.data import create_dataset

    ds = create_dataset("synthetic_512x16_tpl")
    f = ds.images.reshape(len(ds), -1)
    for k in range(3):
        a, b = f[ds.labels == k][:2]
        assert np.corrcoef(a, b)[0, 1] > 0.9
    a = f[ds.labels == 0][0]
    b = f[ds.labels == 1][0]
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.2
    # Deterministic and in-range like the other synthetics.
    ds2 = create_dataset("synthetic_512x16_tpl")
    assert np.array_equal(ds.images, ds2.images)
    assert ds.images.min() >= -1.0 and ds.images.max() <= 1.0


def test_size_ramp_synthetic_label_distribution():
    """The _sizes variant draws labels with p(class k) ∝ k+1 — the knob that
    guarantees exact-Shapley truth spread under a fixed retrain budget (a
    balanced game's short-retrain value is dominated by |remaining data|,
    which is class-symmetric; a size ramp makes it carry ∝ n_k
    heterogeneity). See data/datasets.py:272-282."""
    ds = create_dataset("synthetic_4096x8_c8_tpl_mix_sizes")
    counts = np.bincount(ds.labels, minlength=8).astype(np.float64)
    expected = (np.arange(8) + 1) / 36.0 * len(ds)
    # Multinomial draw: each count within 5 sigma of its expectation.
    sigma = np.sqrt(expected * (1 - expected / len(ds)))
    assert np.all(np.abs(counts - expected) < 5 * sigma), counts
    # The ramp is the point: largest class ~8x the smallest (not uniform).
    assert counts[7] > 4 * counts[0]
    # Class-SIZE spread >= the ~10% relative spread the ground-truth
    # enumeration needs its game values to inherit.
    assert counts.std() / counts.mean() > 0.10
    # Composes with the other tokens: templates + amplitude ramp intact.
    f = ds.images.reshape(len(ds), -1)
    a, b = f[ds.labels == 2][:2]
    assert np.corrcoef(a, b)[0, 1] > 0.9
    # Without the token the labels stay uniform.
    ds_u = create_dataset("synthetic_4096x8_c8_tpl_mix")
    counts_u = np.bincount(ds_u.labels, minlength=8)
    assert counts_u.std() / counts_u.mean() < 0.10
    # Deterministic.
    ds2 = create_dataset("synthetic_4096x8_c8_tpl_mix_sizes")
    assert np.array_equal(ds.labels, ds2.labels)


def test_synthetic_class_count_token():
    """"c<k>" pins the synthetic class count (ground-truth enumeration runs
    need 2^k subsets to stay feasible)."""
    ds = create_dataset("synthetic_256x8_c4_tpl_mix")
    assert set(np.unique(ds.labels)) <= set(range(4))
    assert int(ds.labels.max()) == 3
    # Default stays 10 classes; unknown tokens elsewhere don't confuse it.
    ds10 = create_dataset("synthetic_256x8_tpl_mix")
    assert int(ds10.labels.max()) == 9
