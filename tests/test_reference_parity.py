"""Bit-parity of removal samplers against the reference implementation.

Runs ONLY when the read-only reference checkout is present (development
containers); executes the reference's numpy samplers directly and compares
subsets index-for-index with ours. This pins the determinism contract —
the same removal_seed must identify the same subset in both codebases.
"""

import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE, "src")),
    reason="reference checkout not available",
)


class _FakeDataset:
    """Minimal torch-Dataset stand-in: indexable (image, label) pairs."""

    def __init__(self, labels):
        self._labels = list(labels)

    def __len__(self):
        return len(self._labels)

    def __getitem__(self, i):
        return None, self._labels[i]

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


class _AnyAttr:
    """Placeholder returned for any stubbed attribute access."""

    def __init__(self, *a, **k):
        pass

    def __call__(self, *a, **k):
        return _AnyAttr()

    def __getattr__(self, name):
        return _AnyAttr()


def _stub_module(name, **attrs):
    import types

    class _StubModule(types.ModuleType):
        def __getattr__(self, attr):  # any missing attribute -> stub CLASS
            if attr.startswith("__") and attr.endswith("__"):
                raise AttributeError(attr)  # keep inspect/import machinery sane
            # A class (not an instance) so the reference can subclass it
            # (e.g. `class CIFAR2(CIFAR10)`), call it, or ignore it.
            return type(attr, (_AnyAttr,), {})

    mod = sys.modules.get(name)
    if not isinstance(mod, _StubModule):
        mod = _StubModule(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


@pytest.fixture(scope="module")
def ref_datasets():
    import importlib

    # The reference's src/datasets.py imports torchvision/pandas/etc. at
    # module level; only the removal samplers are exercised here, so missing
    # heavyweight deps are stubbed out (never called).
    for name in (
        "torchvision",
        "torchvision.datasets",
        "torchvision.transforms",
        "torchvision.models",
    ):
        _stub_module(name)
    sys.modules["torchvision"].datasets = sys.modules["torchvision.datasets"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]

    sys.path.insert(0, REFERENCE)
    # src/constants.py is user-created in the reference (README.md:19-28)
    # and absent from the checkout — provide the documented names.
    _stub_module(
        "src.constants",
        DATASET_DIR="/tmp/ref_ds", OUTDIR="/tmp/ref_out", LOGDIR="/tmp/ref_log",
        TMP_OUTDIR="/tmp/ref_tmp", PRETRAINEDMODEL_DIR="/tmp/ref_pre",
        GLOBAL_MODEL_BEHAVIOR_DIR="/tmp/ref_gmb",
        MAX_NUM_SAMPLE_IMAGES_TO_SAVE=64,
        DATASET=["cifar"], METHOD=["retrain"],
    )
    try:
        mod = importlib.import_module("src.datasets")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return mod


def test_uniform_parity(ref_datasets):
    from group_attribution_for_diffusion_models_tpu.data import remove_data_by_uniform

    ds = _FakeDataset([0] * 137)
    for seed in (0, 1, 42, 43, 44, 1000):
        ref_rem, ref_removed = ref_datasets.remove_data_by_uniform(ds, seed=seed)
        our_rem, our_removed = remove_data_by_uniform(137, seed=seed)
        np.testing.assert_array_equal(ref_rem, our_rem)
        np.testing.assert_array_equal(ref_removed, our_removed)


def test_shapley_parity(ref_datasets):
    from group_attribution_for_diffusion_models_tpu.data import remove_data_by_shapley

    ds = _FakeDataset([0] * 258)  # the ArtBench group count
    for seed in (0, 7, 42, 123):
        ref_rem, ref_removed = ref_datasets.remove_data_by_shapley(ds, seed=seed)
        our_rem, our_removed = remove_data_by_shapley(258, seed=seed)
        np.testing.assert_array_equal(ref_rem, our_rem)
        np.testing.assert_array_equal(ref_removed, our_removed)


def test_datamodel_parity(ref_datasets):
    from group_attribution_for_diffusion_models_tpu.data import remove_data_by_datamodel

    ds = _FakeDataset([0] * 500)
    for seed in (42, 43, 44):
        for alpha in (0.25, 0.5, 0.75):
            ref_rem, _ = ref_datasets.remove_data_by_datamodel(
                ds, alpha=alpha, seed=seed
            )
            our_rem, _ = remove_data_by_datamodel(500, alpha=alpha, seed=seed)
            np.testing.assert_array_equal(ref_rem, our_rem)


def test_shapley_by_class_parity(ref_datasets):
    from group_attribution_for_diffusion_models_tpu.data import remove_data_by_shapley

    labels = np.repeat(np.arange(20), 5).tolist()
    ds = _FakeDataset(labels)
    for seed in (0, 5, 42):
        ref_rem, ref_removed = ref_datasets.remove_data_by_shapley(
            ds, seed=seed, by_class=True
        )
        our_rem, our_removed = remove_data_by_shapley(
            np.asarray(labels), seed=seed, by_class=True
        )
        np.testing.assert_array_equal(ref_rem, our_rem)
        np.testing.assert_array_equal(ref_removed, our_removed)


def test_data_shapley_estimator_parity(ref_datasets):
    """Closed-form estimator: identical coefficients on identical inputs."""
    sys.path.insert(0, REFERENCE)
    try:
        from src.attributions.methods.datashapley import data_shapley as ref_ds
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REFERENCE)
    from group_attribution_for_diffusion_models_tpu.attributions.methods import (
        data_shapley,
    )

    rng = np.random.RandomState(0)
    d, n = 20, 200
    masks = (rng.rand(n, d) > 0.5).astype(np.float64)
    y = masks @ rng.normal(size=d) + 0.01 * rng.normal(size=n)
    ours = data_shapley(d, masks, y, float(y.max()), float(y.min()))
    theirs = ref_ds(d, masks, y, float(y.max()), float(y.min()))
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_data_banzhaf_estimator_parity(ref_datasets):
    """Banzhaf lstsq: identical coefficients on identical inputs."""
    sys.path.insert(0, REFERENCE)
    try:
        from src.attributions.methods.databanzhaf import data_banzhaf as ref_db
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REFERENCE)
    from group_attribution_for_diffusion_models_tpu.attributions.methods import (
        data_banzhaf,
    )

    rng = np.random.RandomState(1)
    d, n = 16, 150
    masks = (rng.rand(n, d) > 0.5).astype(np.float64)
    y = masks @ rng.normal(size=d) + 0.02 * rng.normal(size=n)
    np.testing.assert_allclose(
        np.ravel(data_banzhaf(masks, y)), np.ravel(ref_db(masks, y)), atol=1e-10
    )


def test_kernel_shap_variants_parity(ref_datasets):
    """Weighted kernel-SHAP variants match the reference's lstsq solutions."""
    sys.path.insert(0, REFERENCE)
    try:
        from src.attributions.methods.datashapley import (
            kernel_shap as ref_ks,
        )
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference import failed: {e}")
    finally:
        sys.path.remove(REFERENCE)
    from group_attribution_for_diffusion_models_tpu.attributions.methods.datashapley import (
        kernel_shap,
    )

    rng = np.random.RandomState(2)
    d, n = 12, 120
    masks = np.zeros((n, d))
    for i in range(n):  # proper subsets only (kernel weights finite)
        k = rng.randint(1, d)
        masks[i, rng.choice(d, size=k, replace=False)] = 1.0
    y = masks @ rng.normal(size=d) + 0.01 * rng.normal(size=n)
    ours = kernel_shap(d, masks, y, float(y.max()), float(y.min()))
    theirs = ref_ks(d, masks, y, float(y.max()), float(y.min()))
    np.testing.assert_allclose(np.ravel(ours), np.ravel(theirs), atol=1e-8)
