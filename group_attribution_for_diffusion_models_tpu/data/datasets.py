"""Numpy-native dataset registry.

TPU-first replacement for the reference's torchvision-based registry
(reference src/datasets.py:398-513). Every dataset materializes as a
`ArrayDataset`: an images array in **NHWC float32 normalized to [-1, 1]**
plus an integer label array — feeding `jnp` batches with zero per-item Python
overhead, so the input pipeline never stalls the TPU.

Covered datasets (parity with reference src/datasets.py):

* cifar       — CIFAR-10 (reference :447-455)
* cifar2      — CIFAR-10 filtered to {automobile, horse} (reference CIFAR2 :22-56)
* cifar100    — CIFAR-100 animal classes regrouped into 20 groups
                (reference CIFAR100_original :59-118)
* cifar100_f  — CIFAR-100 imbalanced filter, 2,4,...,200 per class
                (reference CIFAR100_filter :273-310)
* mnist       — MNIST idx format (reference :477-489)
* celeba      — CelebA-HQ 256 image dir + labels.csv with celeb group
                (reference CelebA :313-347)
* imagefolder — generic directory of images (reference ImageDataset :350-373)
* synthetic_* — deterministic random datasets for tests/benchmarks (no
                downloads; this environment has no network egress)

Raw archives are read from ``constants.DATASET_DIR`` in their standard binary
formats (no torchvision dependency).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import re
import struct
from typing import List, Optional, Tuple

import numpy as np

from ..config import constants

# CIFAR-10 class indices: 1 = automobile, 7 = horse (reference src/datasets.py:22-56).
CIFAR2_CLASSES = (1, 7)

# CIFAR-100 animal-superclass fine labels kept by CIFAR100_original
# (reference src/datasets.py:59-118): the 20 classes of the 4 animal
# superclasses used in the paper's CIFAR-100 experiments.
CIFAR100_ANIMAL_SUPERCLASSES = {
    "aquatic_mammals": [4, 30, 55, 72, 95],
    "fish": [1, 32, 67, 73, 91],
    "large_carnivores": [3, 42, 43, 88, 97],
    "large_omnivores_and_herbivores": [15, 19, 21, 31, 38],
}


@dataclasses.dataclass
class ArrayDataset:
    """Images (N, H, W, C) float32 in [-1, 1] + integer group labels (N,).

    ``names`` optionally carries per-item string ids (filenames, celeb names)
    for group-table workloads.
    """

    images: np.ndarray
    labels: np.ndarray
    names: Optional[List[str]] = None

    def __post_init__(self):
        assert self.images.ndim == 4, self.images.shape
        assert len(self.images) == len(self.labels)

    def __len__(self) -> int:
        return len(self.images)

    def subset(self, idx: np.ndarray) -> "ArrayDataset":
        names = [self.names[i] for i in idx] if self.names is not None else None
        return ArrayDataset(self.images[idx], self.labels[idx], names)

    @property
    def num_classes(self) -> int:
        return int(len(np.unique(self.labels)))


def _normalize(u8: np.ndarray) -> np.ndarray:
    """uint8 [0,255] -> float32 [-1,1] (the reference's Normalize([0.5],[0.5]))."""
    return (u8.astype(np.float32) / 255.0 - 0.5) / 0.5


# --- CIFAR ------------------------------------------------------------------


def _load_cifar10_raw(root: str, train: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Parse the python-pickle CIFAR-10 archive layout."""
    base = os.path.join(root, "cifar-10-batches-py")
    files = (
        [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    )
    xs, ys = [], []
    for fname in files:
        with open(os.path.join(base, fname), "rb") as f:
            entry = pickle.load(f, encoding="latin1")
        xs.append(np.asarray(entry["data"], dtype=np.uint8))
        ys.extend(entry.get("labels", entry.get("fine_labels")))
    x = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return x, np.asarray(ys, dtype=np.int64)


def _load_cifar100_raw(root: str, train: bool) -> Tuple[np.ndarray, np.ndarray]:
    base = os.path.join(root, "cifar-100-python")
    fname = "train" if train else "test"
    with open(os.path.join(base, fname), "rb") as f:
        entry = pickle.load(f, encoding="latin1")
    x = np.asarray(entry["data"], dtype=np.uint8).reshape(-1, 3, 32, 32)
    return x.transpose(0, 2, 3, 1), np.asarray(entry["fine_labels"], dtype=np.int64)


def _load_mnist_raw(root: str, train: bool) -> Tuple[np.ndarray, np.ndarray]:
    """Parse MNIST idx files; pads 28x28 -> 32x32 like the reference's Pad(2)."""
    prefix = "train" if train else "t10k"
    base = os.path.join(root, "MNIST", "raw")
    with open(os.path.join(base, f"{prefix}-images-idx3-ubyte"), "rb") as f:
        _, n, rows, cols = struct.unpack(">IIII", f.read(16))
        images = np.frombuffer(f.read(), dtype=np.uint8).reshape(n, rows, cols, 1)
    with open(os.path.join(base, f"{prefix}-labels-idx1-ubyte"), "rb") as f:
        _, n = struct.unpack(">II", f.read(8))
        labels = np.frombuffer(f.read(), dtype=np.uint8).astype(np.int64)
    return images, labels


# --- CelebA-HQ / image folders ---------------------------------------------


def _load_image_dir(
    root: str, size: int, labels_csv: Optional[str] = None
) -> ArrayDataset:
    """Load a directory of images, optionally with a labels.csv group table.

    Mirrors reference CelebA (src/datasets.py:313-347): labels.csv columns
    ``(filename, celeb)``; items return (image, group, filename).
    """
    from PIL import Image

    if labels_csv is not None:
        import pandas as pd

        df = pd.read_csv(labels_csv)
        fname_col, group_col = df.columns[0], df.columns[1]
        files = df[fname_col].tolist()
        groups = df[group_col].astype("category").cat.codes.to_numpy(np.int64)
    else:
        files = sorted(
            f
            for f in os.listdir(root)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".webp"))
        )
        groups = np.zeros(len(files), dtype=np.int64)

    # Native multithreaded decode+resize (libpng/libjpeg via ctypes) is the
    # fast path for 30k-image dirs; PIL decodes one by one otherwise — and
    # also when the dir holds a format the native decoder lacks (webp, CMYK
    # jpeg, ...), which raises ValueError rather than silently degrading.
    from ..utils.native_images import load_image_batch

    paths = [os.path.join(root, f) for f in files]
    try:
        imgs = load_image_batch(paths, size)
    except ValueError:
        imgs = None
    if imgs is None:
        imgs = np.empty((len(files), size, size, 3), dtype=np.uint8)
        for i, path in enumerate(paths):
            with Image.open(path) as im:
                im = im.convert("RGB").resize((size, size), Image.BILINEAR)
                imgs[i] = np.asarray(im, dtype=np.uint8)
    return ArrayDataset(_normalize(imgs), groups, names=list(files))


# --- CIFAR-100 variants -----------------------------------------------------


def _cifar100_animals(x: np.ndarray, y: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Filter to the 20 animal classes and relabel by superclass-major order.

    Reference CIFAR100_original (src/datasets.py:59-118) keeps 4 animal
    superclasses (20 fine classes) and relabels them 0..19.
    """
    kept: List[int] = []
    for sc in CIFAR100_ANIMAL_SUPERCLASSES.values():
        kept.extend(sc)
    kept_arr = np.asarray(sorted(kept))
    mask = np.isin(y, kept_arr)
    relabel = {c: i for i, c in enumerate(kept_arr.tolist())}
    new_y = np.asarray([relabel[c] for c in y[mask].tolist()], dtype=np.int64)
    return x[mask], new_y


def _cifar100_imbalanced(
    x: np.ndarray, y: np.ndarray, seed: int = 42
) -> Tuple[np.ndarray, np.ndarray]:
    """Imbalanced-class filter: class k keeps 2*(k+1) examples (2,4,...,200).

    Reference CIFAR100_filter (src/datasets.py:273-310).
    """
    rng = np.random.RandomState(seed)
    keep_idx: List[int] = []
    for cls in range(100):
        cls_idx = np.flatnonzero(y == cls)
        rng.shuffle(cls_idx)
        keep_idx.extend(cls_idx[: 2 * (cls + 1)].tolist())
    keep = np.asarray(sorted(keep_idx))
    return x[keep], y[keep]


def cifar100_regroup(
    features: np.ndarray, num_groups: int = 40, seed: int = 0
) -> np.ndarray:
    """K-means regrouping of PER-IMAGE features into pseudo-groups.

    Reference CIFAR100_regroup.apply_clustering (src/datasets.py:198-235)
    embeds every image with pretrained ResNet-18 and k-means the IMAGES
    (not class means) into ``num_groups`` groups with
    ``KMeans(n_clusters=40, random_state=0)`` — so a pseudo-group can split
    an original class. The feature extractor is pluggable: pass any (N, D)
    per-image features (models.resnet.resnet18_embed reproduces the
    reference's tower + preprocessing). Returns per-image group labels.
    """
    from sklearn.cluster import KMeans

    km = KMeans(n_clusters=num_groups, random_state=seed, n_init=10).fit(
        np.asarray(features)
    )
    return np.asarray(km.labels_, dtype=np.int64)


# --- Synthetic (test/bench) -------------------------------------------------


def make_synthetic(
    n: int = 256,
    size: int = 32,
    channels: int = 3,
    num_classes: int = 10,
    seed: int = 0,
    heterogeneous: bool = False,
    textured: bool = False,
    templated: bool = False,
    size_ramp: bool = False,
) -> ArrayDataset:
    """Deterministic random dataset for tests and benchmarks.

    `heterogeneous` scales each class's image amplitude by its label
    (class k amplitude ~ (k+1)/num_classes), so model behaviors genuinely
    depend on WHICH examples a removal subset keeps — giving attribution
    demos real signal instead of i.i.d. noise ("synthetic_<n>x<s>_mix").

    `textured` gives class k a distinct spatial SMOOTHNESS (box filter of
    width ~k) instead — a spectrum difference that survives the GroupNorm
    layers of a VAE encoder, so latent-space attribution demos keep their
    signal where pure amplitude scaling gets normalized away
    ("synthetic_<n>x<s>_tex", combinable with _ldm).

    `templated` concentrates class k on a FIXED random template image
    (image = 0.85*template_k + 0.15*noise). Unlike amplitude (`_mix`) or
    smoothness (`_tex`) classes, templates do NOT interpolate: a model
    trained without class k cannot denoise class-k probes, so removal of a
    class measurably moves any probe-loss behavior. This is the synthetic
    analog of the reference's real class structure (CIFAR class exclusion
    removes modes, src/datasets.py:525) and the right surface for
    attribution QUALITY demos — on `_mix`, class masks explain only ~25% of
    the behavior variance (measured), bounding LDS regardless of estimator
    ("synthetic_<n>x<s>_tpl").

    `size_ramp` draws labels with p(class k) ∝ k+1 instead of uniformly
    ("synthetic_<n>x<s>_sizes", combinable with the others), giving the
    exact-Shapley game ∝ n_k heterogeneity on top of class content.
    MEASURED CAVEAT (on-chip c8 enumeration,
    docs/groundtruth_chip_c8_sizes_summary.json): the ramp ALONE does not
    rescue truth spread — at the mid-noise eval band (t in [100,600)) every
    200-step subset model reaches ~the same probe loss (game range ~7% of
    v1) because mid-t eps prediction generalizes across these statistically
    similar classes, so exact values stay near-uniform (0.95% relative
    spread). What moves the game is the EVAL BAND: at t in [0,100) the
    probe is nearly clean and eps prediction requires knowing the probe's
    template, so unseen-class probes stay expensive and the same dataset's
    exact values spread 38.7% relative (c6 CPU enumeration, paired-KernelSHAP
    Pearson 0.89 at 62 fit subsets). Quality demos should combine _sizes
    with --eval_t_max ~100.
    """
    rng = np.random.RandomState(seed)
    images = rng.uniform(-1.0, 1.0, size=(n, size, size, channels)).astype(np.float32)
    if size_ramp:
        p = (np.arange(num_classes) + 1).astype(np.float64)
        labels = rng.choice(num_classes, size=n, p=p / p.sum()).astype(np.int64)
    else:
        labels = rng.randint(0, num_classes, size=n).astype(np.int64)
    if templated:
        t_rng = np.random.RandomState(seed + 1)
        templates = t_rng.uniform(
            -1.0, 1.0, size=(num_classes, size, size, channels)
        ).astype(np.float32)
        images = templates[labels] * 0.85 + images * 0.15
    if textured:
        # Separable box smoothing; renormalized to unit std so amplitude
        # stays class-independent (the signal is spectral, not scale).
        for k in range(num_classes):
            w = 1 + (k % 4)
            if w == 1:
                continue
            idx = np.flatnonzero(labels == k)
            if not len(idx):
                continue
            kernel = np.ones(w, np.float32) / w
            sub = images[idx]
            sub = np.apply_along_axis(
                lambda v: np.convolve(v, kernel, mode="same"), 1, sub
            )
            sub = np.apply_along_axis(
                lambda v: np.convolve(v, kernel, mode="same"), 2, sub
            )
            sub = sub / max(sub.std(), 1e-6) * images.std()
            images[idx] = sub.astype(np.float32)
    if heterogeneous:
        # Applied LAST so the amplitude ramp scales the whole image —
        # including templates ("_tpl_mix"): class k's removal then moves a
        # probe loss ∝ amp_k^2, giving attribution demos heterogeneous
        # ground-truth importance (equal-amplitude templates have near-equal
        # Shapley values, which bounds LDS by retrain noise at fixed |S|).
        amp = ((labels + 1) / num_classes).astype(np.float32)
        images = images * amp[:, None, None, None]
    return ArrayDataset(images, labels)


# --- Registry ---------------------------------------------------------------


def create_dataset(
    dataset_name: str,
    train: bool = True,
    dataset_dir: Optional[str] = None,
) -> ArrayDataset:
    """Build a dataset by name (reference create_dataset src/datasets.py:398-513)."""
    root = dataset_dir or constants.DATASET_DIR

    if dataset_name.startswith("synthetic"):
        # "synthetic", "synthetic_64x8" (n=64 size=8), "..._mix" (class-
        # dependent amplitudes) etc., for tests.
        parts = dataset_name.split("_")
        n, size = 256, 32
        if len(parts) > 1 and "x" in parts[1]:
            n, size = (int(v) for v in parts[1].split("x"))
        # "c<k>" token pins the class count (default 10): e.g.
        # "synthetic_1024x32_c8_tpl_mix" — 8 classes makes exhaustive
        # 2^k subset enumeration feasible for ground-truth Shapley demos.
        num_classes = next(
            (int(p[1:]) for p in parts[2:] if re.fullmatch(r"c\d+", p)), 10
        )
        # A typo'd token ("tlp", "mx") silently dropping its signal would
        # corrupt attribution demos — reject anything unrecognized.
        # "ldm"/"cond"/"big" are workload tokens consumed by cli/common.py's
        # config builder; the dataset itself ignores them.
        known = {"mix", "tex", "tpl", "sizes", "ldm", "cond", "big"}
        bad = [p for p in parts[1:]
               if p not in known and not re.fullmatch(r"\d+x\d+|c\d+", p)]
        if bad:
            raise ValueError(
                f"unknown synthetic dataset token(s) {bad} in {dataset_name!r}"
            )
        return make_synthetic(n=n, size=size, num_classes=num_classes,
                              heterogeneous="mix" in parts,
                              textured="tex" in parts,
                              templated="tpl" in parts,
                              size_ramp="sizes" in parts)

    if dataset_name == "cifar":
        x, y = _load_cifar10_raw(root, train)
        return ArrayDataset(_normalize(x), y)
    if dataset_name == "cifar2":
        x, y = _load_cifar10_raw(root, train)
        mask = np.isin(y, CIFAR2_CLASSES)
        # Relabel to 0/1 by sorted class order like the reference's CIFAR2.
        y2 = (y[mask] == CIFAR2_CLASSES[1]).astype(np.int64)
        return ArrayDataset(_normalize(x[mask]), y2)
    if dataset_name == "cifar100":
        x, y = _load_cifar100_raw(root, train)
        x, y = _cifar100_animals(x, y)
        return ArrayDataset(_normalize(x), y)
    if dataset_name == "cifar100_f":
        x, y = _load_cifar100_raw(root, train)
        x, y = _cifar100_imbalanced(x, y)
        return ArrayDataset(_normalize(x), y)
    if dataset_name == "cifar100_new":
        # Reference CIFAR100_regroup ("cifar100_new", src/datasets.py:121-235,
        # 472-477): animal classes, then per-image ResNet-18 embeddings
        # k-means'd into 40 pseudo-groups; the group labels are cached next
        # to the data exactly like the reference's cifar100_new_targets.pkl.
        x, y = _load_cifar100_raw(root, train)
        x, _ = _cifar100_animals(x, y)
        cache = os.path.join(root, "cifar100_new_targets.npy")
        if os.path.exists(cache):
            groups = np.load(cache)
            if len(groups) != len(x):
                raise ValueError(
                    f"{cache} holds {len(groups)} targets for {len(x)} images"
                )
        else:
            weights = os.environ.get("GADM_RESNET18_WEIGHTS")
            if not weights:
                raise ValueError(
                    "cifar100_new needs per-image ResNet-18 group labels: "
                    f"no cache at {cache} and GADM_RESNET18_WEIGHTS is unset "
                    "(convert torchvision resnet18 via cli.convert_weights "
                    "--kind resnet18)"
                )
            from ..models.resnet import resnet18_embed, unflatten_npz

            variables = unflatten_npz(np.load(weights))
            feats = resnet18_embed(variables, (_normalize(x) + 1.0) / 2.0)
            groups = cifar100_regroup(feats, num_groups=40, seed=0)
            np.save(cache, groups)
        return ArrayDataset(_normalize(x), groups.astype(np.int64))
    if dataset_name == "mnist":
        x, y = _load_mnist_raw(root, train)
        # Pad 28->32 with -1 (black) so the U-Net sample_size=32 applies.
        x = _normalize(x)
        pad = ((0, 0), (2, 2), (2, 2), (0, 0))
        return ArrayDataset(np.pad(x, pad, constant_values=-1.0), y)
    if dataset_name == "celeba":
        img_dir = os.path.join(root, "celeba_hq", "train" if train else "test")
        labels_csv = os.path.join(img_dir, "labels.csv")
        return _load_image_dir(
            img_dir, 256, labels_csv if os.path.exists(labels_csv) else None
        )
    if dataset_name == "imagenette":
        split = "train" if train else "val"
        return _load_image_dir(os.path.join(root, "imagenette2", split), 256)

    raise ValueError(
        f"dataset_name={dataset_name!r} should be one of "
        "['cifar', 'cifar2', 'cifar100', 'cifar100_f', 'mnist', 'celeba', "
        "'imagenette', 'synthetic*']"
    )


def batch_iterator(
    dataset: ArrayDataset,
    batch_size: int,
    seed: int,
    drop_remainder: bool = True,
):
    """Infinite shuffled epoch iterator over numpy batches.

    Host-side and allocation-free beyond index math; batches are handed to
    jitted train steps which overlap H2D transfer with compute.
    """
    n = len(dataset)
    rng = np.random.RandomState(seed)
    while True:
        perm = rng.permutation(n)
        end = (n // batch_size) * batch_size if drop_remainder else n
        for i in range(0, end, batch_size):
            idx = perm[i : i + batch_size]
            yield dataset.images[idx], dataset.labels[idx]
