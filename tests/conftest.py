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
    flags += " --xla_force_host_platform_device_count=8"
# XLA CPU compiles at full opt are pathologically slow on this box (~30-90s per
# program); opt level 0 compiles the same programs in ~1s.  Tests trade a bit
# of runtime for two orders of magnitude less compile latency.
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags.strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_comp"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.makedirs(os.environ["JAX_COMPILATION_CACHE_DIR"], exist_ok=True)

import jax  # noqa: E402

# The axon sitecustomize force-sets jax_platforms="axon,cpu" at interpreter
# start (ignoring the JAX_PLATFORMS env var), which would silently run "CPU"
# tests on the remote TPU chip.  Override it after import, before backend init.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
