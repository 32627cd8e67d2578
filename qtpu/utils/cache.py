"""Persistent XLA compilation cache setup.

First-compile latency dominates small-model iteration on both CPU and TPU
(~20-40s cold, per the environment notes).  Importing this module (or calling
:func:`enable_persistent_cache`) before heavy jax use makes compiles survive
process restarts.  Safe to call multiple times.
"""
from __future__ import annotations

import os

DEFAULT_DIR = os.path.expanduser("~/.cache/jax_comp")


def enable_persistent_cache(path: str = DEFAULT_DIR) -> None:
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
