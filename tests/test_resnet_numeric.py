"""Numeric parity: Flax ResNet-18 vs a torch oracle on shared weights.

The reference's CIFAR100 regroup pathway embeds every image with
torchvision's pretrained resnet18 minus the fc head (reference
src/datasets.py:198-235). The oracle below rebuilds that graph in plain
torch with torchvision's state-dict naming (conv1/bn1/layerL.B.*/downsample),
so convert_resnet18_state_dict is exercised on the exact layout real weights
use. A width-scaled config keeps the test fast; the layout map is
width-agnostic. Parity on random weights transfers to the published
checkpoint because the converter is a layout map, not a value transform.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

STAGES = (8, 16, 24, 32)
BLOCKS = (2, 2, 2, 2)
SIZE = 64


class _TorchBasicBlock(torch.nn.Module):
    def __init__(self, in_ch, ch, stride):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(in_ch, ch, 3, stride, 1, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(ch)
        self.conv2 = torch.nn.Conv2d(ch, ch, 3, 1, 1, bias=False)
        self.bn2 = torch.nn.BatchNorm2d(ch)
        if stride != 1 or in_ch != ch:
            self.downsample = torch.nn.Sequential(
                torch.nn.Conv2d(in_ch, ch, 1, stride, bias=False),
                torch.nn.BatchNorm2d(ch),
            )
        else:
            self.downsample = None

    def forward(self, x):
        idt = x if self.downsample is None else self.downsample(x)
        h = torch.relu(self.bn1(self.conv1(x)))
        h = self.bn2(self.conv2(h))
        return torch.relu(h + idt)


class _TorchResNet(torch.nn.Module):
    """torchvision resnet18 graph minus the fc head (the reference strips it)."""

    def __init__(self, stages, blocks):
        super().__init__()
        self.conv1 = torch.nn.Conv2d(3, stages[0], 7, 2, 3, bias=False)
        self.bn1 = torch.nn.BatchNorm2d(stages[0])
        self.maxpool = torch.nn.MaxPool2d(3, 2, 1)
        in_ch = stages[0]
        for i, (ch, n) in enumerate(zip(stages, blocks)):
            layer = []
            for b in range(n):
                stride = 2 if (i > 0 and b == 0) else 1
                layer.append(_TorchBasicBlock(in_ch, ch, stride))
                in_ch = ch
            setattr(self, f"layer{i + 1}", torch.nn.Sequential(*layer))

    def forward(self, x):
        h = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for i in range(4):
            h = getattr(self, f"layer{i + 1}")(h)
        return h.mean(dim=(2, 3))


def _randomize_bn_stats(model, seed=0):
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(torch.randn(m.num_features, generator=g) * 0.3)
            m.running_var.copy_(torch.rand(m.num_features, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.num_features, generator=g) * 0.2 + 1)
            m.bias.data.copy_(torch.randn(m.num_features, generator=g) * 0.1)


def test_resnet18_converter_matches_torch_forward():
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.resnet import (
        ResNet18Features,
        convert_resnet18_state_dict,
    )

    torch.manual_seed(0)
    oracle = _TorchResNet(STAGES, BLOCKS).eval()
    with torch.no_grad():
        _randomize_bn_stats(oracle)

    variables = convert_resnet18_state_dict(oracle.state_dict())
    model = ResNet18Features(stages=STAGES, blocks=BLOCKS, preprocess="none")

    x = np.random.RandomState(1).rand(4, SIZE, SIZE, 3).astype(np.float32)
    with torch.no_grad():
        want = oracle(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(model.apply(variables, jnp.asarray(x)))

    assert got.shape == want.shape == (4, STAGES[-1])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_resnet18_full_width_param_shapes():
    """The default config matches real torchvision resnet18 leaf shapes."""
    import jax
    import jax.numpy as jnp

    from group_attribution_for_diffusion_models_tpu.models.resnet import (
        ResNet18Features,
    )

    model = ResNet18Features()
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    flat = jax.tree_util.tree_leaves(variables["params"])
    n = sum(x.size for x in flat)
    # torchvision resnet18 minus fc: 11,176,512 params
    assert n == 11_176_512


def test_resnet18_embed_and_regroup_per_image_semantics():
    """Per-image clustering can split an original class — exactly what the
    reference's apply_clustering does and class-mean clustering cannot."""
    import jax

    from group_attribution_for_diffusion_models_tpu.data import cifar100_regroup

    # One "class" whose images straddle two well-separated feature clusters.
    rng = np.random.RandomState(0)
    f0 = rng.normal(0.0, 0.05, size=(20, 8)) + np.array([10.0] + [0] * 7)
    f1 = rng.normal(0.0, 0.05, size=(20, 8)) - np.array([10.0] + [0] * 7)
    feats = np.concatenate([f0, f1])
    groups = cifar100_regroup(feats, num_groups=2, seed=0)
    assert groups.shape == (40,)
    assert len(set(groups[:20])) == 1 and len(set(groups[20:])) == 1
    assert groups[0] != groups[-1]  # the class got split

    # And the exact sklearn call matches the reference's
    # (KMeans(n_clusters=k, random_state=0), src/datasets.py:227-229).
    from sklearn.cluster import KMeans

    want = KMeans(n_clusters=2, random_state=0, n_init=10).fit(feats).labels_
    np.testing.assert_array_equal(groups, want)


def test_cifar100_new_dataset_uses_cached_targets(tmp_path, monkeypatch):
    """create_dataset('cifar100_new') honors the cached per-image group
    labels (the reference's cifar100_new_targets.pkl contract)."""
    import pickle

    from group_attribution_for_diffusion_models_tpu.data import create_dataset

    root = str(tmp_path)
    c100 = tmp_path / "cifar-100-python"
    c100.mkdir()
    rng = np.random.RandomState(0)
    data = rng.randint(0, 256, size=(300, 3072), dtype=np.int64).astype(np.uint8)
    fine = [i % 100 for i in range(300)]
    with open(c100 / "train", "wb") as f:
        pickle.dump({"data": data, "fine_labels": fine}, f)
    base = create_dataset("cifar100", dataset_dir=root)
    groups = np.arange(len(base.images)) % 5
    np.save(tmp_path / "cifar100_new_targets.npy", groups)

    ds = create_dataset("cifar100_new", dataset_dir=root)
    assert ds.images.shape == base.images.shape
    np.testing.assert_array_equal(ds.labels, groups)

    # Without the cache and without weights: a clear error, not a crash.
    (tmp_path / "cifar100_new_targets.npy").unlink()
    monkeypatch.delenv("GADM_RESNET18_WEIGHTS", raising=False)
    with pytest.raises(ValueError, match="GADM_RESNET18_WEIGHTS"):
        create_dataset("cifar100_new", dataset_dir=root)
