"""Test configuration: force an 8-virtual-device CPU mesh.

SURVEY.md §4.2: unit + multi-device tests run on CPU with
``--xla_force_host_platform_device_count=8`` so mesh/sharding/collective logic is
exercised without a pod slice.  Must be set before jax is imported anywhere.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", False)
