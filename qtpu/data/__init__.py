"""Data loading: real datasets when available, deterministic synthetic fallback."""
from qtpu.data.datasets import Dataset, batches, load_dataset, synthetic_dataset
from qtpu.data.pipeline import grain_batches

__all__ = ["Dataset", "batches", "grain_batches", "load_dataset",
           "synthetic_dataset"]
