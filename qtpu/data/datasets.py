"""Datasets: MNIST/CIFAR-10 loaders with a deterministic synthetic fallback.

The reference's examples consume MNIST / CIFAR-10 / ImageNet (SURVEY.md §1.2 R1
[K-med]; mount empty, §0).  This environment has **no network egress and no
cached datasets** [E], so every loader:

1. tries an ``.npz`` cache (``$QTPU_DATA_DIR/<name>_<split>.npz``),
2. tries an ImageFolder tree (``$QTPU_DATA_DIR/<name>/<split>/<class>/*.jpg``
   — the standard ImageNet layout; decoded with PIL, resized/center-cropped
   to the dataset's shape),
3. tries HuggingFace ``datasets`` (works if a cache appears in a later session),
4. falls back to a *deterministic synthetic* dataset with the same shapes and
   class count, flagged via ``Dataset.synthetic``.

The synthetic task is built to be learnable by a small CNN (class-specific
low-frequency prototypes + brightness jitter + shifts + noise), so fp32-vs-INT8
accuracy *deltas* — the reference's de-facto test metric (SURVEY.md §4.1) —
remain meaningful even without the real data.
"""
from __future__ import annotations

import dataclasses
import os
from typing import Iterator, Optional, Tuple

import numpy as np


@dataclasses.dataclass
class Dataset:
    images: np.ndarray          # (N, H, W, C) float32, roughly [0, 1]
    labels: np.ndarray          # (N,) int32
    num_classes: int
    synthetic: bool = False

    def __len__(self) -> int:
        return len(self.images)


_SPECS = {
    "mnist": dict(shape=(28, 28, 1), num_classes=10, hf="mnist",
                  img_key="image"),
    "cifar10": dict(shape=(32, 32, 3), num_classes=10, hf="cifar10",
                    img_key="img"),
    "imagenet": dict(shape=(224, 224, 3), num_classes=1000, hf=None,
                     img_key=None),
}


def _smooth_prototypes(rng: np.random.Generator, num_classes: int,
                       shape: Tuple[int, int, int]) -> np.ndarray:
    """Per-class low-frequency patterns: coarse noise upsampled bilinearly."""
    h, w, c = shape
    coarse = rng.standard_normal((num_classes, max(h // 4, 2), max(w // 4, 2), c))
    # bilinear upsample with numpy (no scipy dependency in the loader)
    ys = np.linspace(0, coarse.shape[1] - 1, h)
    xs = np.linspace(0, coarse.shape[2] - 1, w)
    y0 = np.floor(ys).astype(int); y1 = np.minimum(y0 + 1, coarse.shape[1] - 1)
    x0 = np.floor(xs).astype(int); x1 = np.minimum(x0 + 1, coarse.shape[2] - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    top = coarse[:, y0][:, :, x0] * (1 - wx) + coarse[:, y0][:, :, x1] * wx
    bot = coarse[:, y1][:, :, x0] * (1 - wx) + coarse[:, y1][:, :, x1] * wx
    protos = top * (1 - wy) + bot * wy
    protos = (protos - protos.min()) / (np.ptp(protos) + 1e-9)
    return protos.astype(np.float32)


def synthetic_dataset(name: str, split: str, n: Optional[int] = None,
                      noise: float = 0.25, seed: int = 0) -> Dataset:
    """Deterministic synthetic stand-in shaped like the named dataset.

    The number of *distinct* labels is capped so the task stays learnable at
    small n (a 1000-way task with one image per class measures nothing);
    labels remain valid for the dataset's nominal class count, so models keep
    their real output dimension and accuracy *deltas* stay meaningful.
    """
    spec = _SPECS[name]
    shape, num_classes = spec["shape"], spec["num_classes"]
    if n is None:
        n = 10_000 if split == "train" else 2_000
    effective = min(num_classes, 50)     # split-independent, learnable at small n
    proto_rng = np.random.default_rng(seed + 12345)      # split-independent
    protos = _smooth_prototypes(proto_rng, effective, shape)
    rng = np.random.default_rng(seed + (0 if split == "train" else 777))
    labels = rng.integers(0, effective, size=n).astype(np.int32)
    imgs = protos[labels].copy()
    # brightness/contrast jitter
    imgs *= rng.uniform(0.7, 1.3, size=(n, 1, 1, 1)).astype(np.float32)
    imgs += rng.uniform(-0.1, 0.1, size=(n, 1, 1, 1)).astype(np.float32)
    # small circular shifts (vectorized per unique offset)
    sh = rng.integers(-2, 3, size=(n, 2))
    for dy in range(-2, 3):
        for dx in range(-2, 3):
            m = (sh[:, 0] == dy) & (sh[:, 1] == dx)
            if m.any() and (dy or dx):
                imgs[m] = np.roll(imgs[m], (dy, dx), axis=(1, 2))
    imgs += rng.standard_normal(imgs.shape).astype(np.float32) * noise
    return Dataset(images=imgs.astype(np.float32), labels=labels,
                   num_classes=num_classes, synthetic=True)


def _data_dir() -> str:
    return os.environ.get("QTPU_DATA_DIR", "/root/data")


def _try_npz(name: str, split: str, n: Optional[int]) -> Optional[Dataset]:
    """``$QTPU_DATA_DIR/<name>_<split>.npz`` with ``images``/``labels``.

    The fastest on-ramp for real data in an offline environment: any process
    that can produce arrays can drop a cache here.  ``images`` may be uint8
    (scaled by /255) or float32.
    """
    path = os.path.join(_data_dir(), f"{name}_{split}.npz")
    if not os.path.isfile(path):
        return None
    with np.load(path) as z:
        imgs, labels = z["images"], z["labels"]
    if n:
        imgs, labels = imgs[:n], labels[:n]
    if imgs.dtype == np.uint8:
        imgs = imgs.astype(np.float32) / 255.0
    if imgs.ndim == 3:
        imgs = imgs[..., None]
    return Dataset(images=np.ascontiguousarray(imgs, np.float32),
                   labels=np.asarray(labels, np.int32),
                   num_classes=_SPECS[name]["num_classes"], synthetic=False)


_IMG_EXTS = (".jpeg", ".jpg", ".png", ".bmp")


def _decode_resize(path: str, shape: Tuple[int, int, int]) -> np.ndarray:
    """PIL decode → shorter-side resize → center crop to (H, W, C)."""
    from PIL import Image

    h, w, c = shape
    with Image.open(path) as im:
        im = im.convert("L" if c == 1 else "RGB")
        sw, sh = im.size
        scale = max(h / sh, w / sw) * (256 / 224 if h >= 64 else 1.0)
        im = im.resize((max(int(round(sw * scale)), w),
                        max(int(round(sh * scale)), h)), Image.BILINEAR)
        sw, sh = im.size
        left, top = (sw - w) // 2, (sh - h) // 2
        im = im.crop((left, top, left + w, top + h))
        arr = np.asarray(im, np.float32) / 255.0
    return arr[..., None] if arr.ndim == 2 else arr


def _try_folder(name: str, split: str, n: Optional[int]) -> Optional[Dataset]:
    """ImageFolder layout: ``<dir>/<name>/<split>/<class>/*.jpg``.

    Class index = rank of the class directory name sorted lexicographically
    (for ImageNet wnids this matches the conventional label order).  ``val``
    is accepted as an alias when ``split='test'`` and vice versa.
    """
    base = os.path.join(_data_dir(), name)
    aliases = {"test": ("test", "val", "validation"),
               "val": ("val", "validation", "test")}
    root = None
    for s in aliases.get(split, (split,)):
        cand = os.path.join(base, s)
        if os.path.isdir(cand):
            root = cand
            break
    if root is None:
        return None
    classes = sorted(d for d in os.listdir(root)
                     if os.path.isdir(os.path.join(root, d)))
    if not classes:
        return None
    spec = _SPECS[name]
    files = []                       # (path, label), class-interleaved so a
    per_class = {}                   # truncated n keeps label diversity
    for ci, cname in enumerate(classes):
        cdir = os.path.join(root, cname)
        fs = sorted(f for f in os.listdir(cdir)
                    if f.lower().endswith(_IMG_EXTS))
        per_class[ci] = [(os.path.join(cdir, f), ci) for f in fs]
    for i in range(max((len(v) for v in per_class.values()), default=0)):
        for ci in range(len(classes)):
            if i < len(per_class[ci]):
                files.append(per_class[ci][i])
    if not files:
        return None
    if n:
        files = files[:n]
    imgs = np.stack([_decode_resize(p, spec["shape"]) for p, _ in files])
    labels = np.asarray([l for _, l in files], np.int32)
    return Dataset(images=imgs, labels=labels,
                   num_classes=spec["num_classes"], synthetic=False)


def _try_hf(name: str, split: str, n: Optional[int]) -> Optional[Dataset]:
    spec = _SPECS[name]
    if spec["hf"] is None:
        return None
    try:
        # No egress in this environment: force offline so a missing cache fails
        # fast instead of retrying DNS for ~50s per load.
        os.environ.setdefault("HF_HUB_OFFLINE", "1")
        os.environ.setdefault("HF_DATASETS_OFFLINE", "1")
        import datasets as hfd

        ds = hfd.load_dataset(spec["hf"], split=split,
                              download_mode="reuse_cache_if_exists")
        if n:
            ds = ds.select(range(min(n, len(ds))))
        imgs = np.stack([np.asarray(im, np.float32) / 255.0
                         for im in ds[spec["img_key"]]])
        if imgs.ndim == 3:
            imgs = imgs[..., None]
        labels = np.asarray(ds["label"], np.int32)
        return Dataset(images=imgs, labels=labels,
                       num_classes=spec["num_classes"], synthetic=False)
    except Exception:
        return None


def load_dataset(name: str, split: str = "train", n: Optional[int] = None,
                 synthetic_ok: bool = True, seed: int = 0) -> Dataset:
    """Load a named dataset; fall back to synthetic when real data is absent."""
    if name not in _SPECS:
        raise ValueError(f"unknown dataset {name!r}; have {sorted(_SPECS)}")
    for loader in (_try_npz, _try_folder, _try_hf):
        real = loader(name, split, n)
        if real is not None:
            return real
    if not synthetic_ok:
        raise RuntimeError(
            f"dataset {name!r} unavailable offline and synthetic_ok=False")
    return synthetic_dataset(name, split, n=n, seed=seed)


def batches(ds: Dataset, batch_size: int, *, seed: int = 0,
            shuffle: bool = True, drop_remainder: bool = True
            ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """One epoch of (images, labels) minibatches."""
    idx = np.arange(len(ds))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    stop = (len(idx) // batch_size * batch_size) if drop_remainder else len(idx)
    for i in range(0, stop, batch_size):
        sel = idx[i:i + batch_size]
        yield ds.images[sel], ds.labels[sel]
