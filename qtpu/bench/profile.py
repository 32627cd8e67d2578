"""Profiling subsystem (SURVEY.md §5.1): jax.profiler traces + named scopes.

``trace(path)`` wraps ``jax.profiler.trace`` — view with XProf/Perfetto
(tensorboard --logdir <path>).  Over this environment's remote-TPU tunnel the
device-side trace may be unavailable; the context degrades to a no-op with a
warning rather than failing the caller, and the slope-fit wall-clock harness
(qtpu.bench.timing) remains the ground truth for kernel numbers.
"""
from __future__ import annotations

import contextlib
import sys


@contextlib.contextmanager
def trace(logdir: str):
    """Capture a profiler trace around a block (best effort)."""
    import jax

    started = False
    try:
        jax.profiler.start_trace(logdir)
        started = True
    except Exception as e:  # pragma: no cover - environment dependent
        print(f"[qtpu.profile] trace unavailable: {e}", file=sys.stderr)
    try:
        yield
    finally:
        if started:
            try:
                jax.profiler.stop_trace()
            except Exception as e:  # pragma: no cover
                print(f"[qtpu.profile] stop_trace failed: {e}",
                      file=sys.stderr)


def annotate(name: str):
    """Named scope for per-layer attribution in traces (jax.named_scope)."""
    import jax

    return jax.named_scope(name)
