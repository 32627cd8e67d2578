"""Real-data loader paths: npz cache, ImageFolder tree, mocked HF cache.

VERDICT round 1 item 9: the loaders must work the moment real data appears,
even though this environment is offline.  Each test fabricates the on-disk
layout in tmp_path and asserts the loader produces a non-synthetic Dataset
with the right shapes/labels.  Reference behavior: SURVEY.md §1.2 R1 examples
consume MNIST/CIFAR/ImageNet folders (mount empty, §0).
"""
import os

import numpy as np
import pytest

from qtpu.data import datasets as D


@pytest.fixture()
def data_dir(tmp_path, monkeypatch):
    monkeypatch.setenv("QTPU_DATA_DIR", str(tmp_path))
    return tmp_path


def test_npz_cache_loader(data_dir):
    imgs = (np.random.default_rng(0).integers(0, 256, (12, 28, 28))
            .astype(np.uint8))
    labels = np.arange(12) % 10
    np.savez(data_dir / "mnist_train.npz", images=imgs, labels=labels)
    ds = D.load_dataset("mnist", "train")
    assert not ds.synthetic
    assert ds.images.shape == (12, 28, 28, 1)
    assert ds.images.dtype == np.float32
    assert float(ds.images.max()) <= 1.0
    assert ds.labels.tolist() == labels.tolist()
    # truncation via n
    ds5 = D.load_dataset("mnist", "train", n=5)
    assert len(ds5) == 5


def test_imagefolder_loader(data_dir):
    from PIL import Image

    # standard ImageNet layout: imagenet/val/<wnid>/*.JPEG, odd native sizes
    rng = np.random.default_rng(1)
    for ci, wnid in enumerate(["n01440764", "n01443537", "n01484850"]):
        cdir = data_dir / "imagenet" / "val" / wnid
        cdir.mkdir(parents=True)
        for j in range(2):
            arr = rng.integers(0, 256, (37 + 13 * ci, 61 + 7 * j, 3),
                               dtype=np.uint8)
            Image.fromarray(arr).save(cdir / f"img{j}.JPEG")
    ds = D.load_dataset("imagenet", "test")       # 'val' accepted as alias
    assert not ds.synthetic
    assert ds.images.shape == (6, 224, 224, 3)
    # class-interleaved ordering keeps label diversity under truncation
    ds3 = D.load_dataset("imagenet", "test", n=3)
    assert sorted(ds3.labels.tolist()) == [0, 1, 2]


def test_folder_label_order_is_lexicographic(data_dir):
    from PIL import Image

    for wnid in ["b_class", "a_class"]:
        cdir = data_dir / "cifar10" / "train" / wnid
        cdir.mkdir(parents=True)
        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(cdir / "x.png")
    ds = D.load_dataset("cifar10", "train")
    # a_class sorts first → label 0
    assert ds.labels.tolist() == [0, 1]


def test_hf_path_mocked(data_dir, monkeypatch):
    """Exercise _try_hf end-to-end against a fake `datasets` module."""
    imgs = [np.full((28, 28), i * 20, np.uint8) for i in range(4)]

    class FakeDS:
        def __len__(self):
            return 4

        def select(self, rng_):
            return self

        def __getitem__(self, key):
            return imgs if key == "image" else [0, 1, 2, 3]

    import sys
    import types

    fake = types.ModuleType("datasets")
    fake.load_dataset = lambda *a, **k: FakeDS()
    monkeypatch.setitem(sys.modules, "datasets", fake)
    ds = D._try_hf("mnist", "train", None)
    assert ds is not None and not ds.synthetic
    assert ds.images.shape == (4, 28, 28, 1)
    assert ds.labels.tolist() == [0, 1, 2, 3]


def test_synthetic_fallback_flagged(data_dir):
    ds = D.load_dataset("cifar10", "test", n=8)
    assert ds.synthetic and ds.images.shape == (8, 32, 32, 3)
    with pytest.raises(RuntimeError):
        D.load_dataset("cifar10", "test", synthetic_ok=False)


def test_grain_pipeline_matches_semantics(data_dir):
    """grain_batches: deterministic shuffled epoch, drop-remainder, full
    coverage — the production input pipeline over the same Dataset."""
    from qtpu.data import grain_batches

    ds = D.load_dataset("mnist", "train", n=70)      # synthetic fallback
    got = list(grain_batches(ds, 16, seed=3))
    assert len(got) == 4                              # 70 // 16, remainder dropped
    xs = np.concatenate([b[0] for b in got])
    ys = np.concatenate([b[1] for b in got])
    assert xs.shape == (64, 28, 28, 1) and ys.shape == (64,)
    # shuffled (not the identity order), deterministic across runs
    got2 = list(grain_batches(ds, 16, seed=3))
    for (x1, y1), (x2, y2) in zip(got, got2):
        np.testing.assert_array_equal(x1, x2)
        np.testing.assert_array_equal(y1, y2)
    assert not np.array_equal(ys, ds.labels[:64])
