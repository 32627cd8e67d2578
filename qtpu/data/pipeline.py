"""Input pipelines over qtpu datasets (SURVEY.md §2.4 qtpu/data row).

Two interchangeable batch iterators:

* :func:`grain_batches` — a `grain` (Google's TPU-native input pipeline
  library) ``IndexSampler`` + ``DataLoader`` over an in-memory
  :class:`qtpu.data.Dataset`: deterministic global shuffle, per-epoch
  reshuffling by seed, worker-parallel map — the production shape for
  feeding a pod, and the TPU-idiomatic replacement for the reference's
  ``gluon.data.DataLoader`` (SURVEY.md §1.2; mount empty, §0).
* :func:`qtpu.data.datasets.batches` — the zero-dependency numpy fallback
  (kept as the default for the tiny offline synthetic sets).

Both yield ``(images, labels)`` numpy pairs with identical semantics
(shuffle by seed, drop remainder), asserted against each other in
tests/test_datasets.py.
"""
from __future__ import annotations

from typing import Iterator, Tuple

import numpy as np

from qtpu.data.datasets import Dataset


def grain_batches(ds: Dataset, batch_size: int, *, seed: int = 0,
                  shuffle: bool = True, num_epochs: int = 1,
                  worker_count: int = 0
                  ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """One (or more) epochs of minibatches via a grain DataLoader."""
    import grain.python as grain

    source = _ArraySource(ds)
    sampler = grain.IndexSampler(
        num_records=len(ds), shard_options=grain.NoSharding(),
        shuffle=shuffle, num_epochs=num_epochs, seed=seed)
    loader = grain.DataLoader(
        data_source=source, sampler=sampler, worker_count=worker_count,
        operations=[grain.Batch(batch_size=batch_size,
                                drop_remainder=True)])
    for batch in loader:
        yield batch["image"], batch["label"]


class _ArraySource:
    """grain RandomAccessDataSource over the in-memory Dataset arrays."""

    def __init__(self, ds: Dataset):
        self._ds = ds

    def __len__(self) -> int:
        return len(self._ds)

    def __getitem__(self, idx: int):
        return {"image": self._ds.images[idx], "label": self._ds.labels[idx]}
