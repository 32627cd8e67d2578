"""Platform selection helper.

The axon sitecustomize in this environment force-sets
``jax_platforms='axon,cpu'`` at interpreter start, silently overriding the
user's ``JAX_PLATFORMS`` env var.  Calling :func:`honor_platform_env` before
the first backend use re-applies the user's choice (e.g. CPU-runnable
examples, the driver's multichip dry run)."""
from __future__ import annotations

import os


def honor_platform_env() -> None:
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        if jax.config.jax_platforms != want:
            jax.config.update("jax_platforms", want)
