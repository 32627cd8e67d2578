"""Data loading: real datasets when available, deterministic synthetic fallback."""
from qtpu.data.datasets import Dataset, batches, load_dataset, synthetic_dataset

__all__ = ["Dataset", "batches", "load_dataset", "synthetic_dataset"]
