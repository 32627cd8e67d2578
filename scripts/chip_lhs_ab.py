"""Focused same-process A/B: latency-hiding scheduler ON (default) vs OFF.

The round-3 options sweep (chip_xla_options_sweep.py) showed one 6.8 ms
(+24%) outlier for xla_tpu_enable_latency_hiding_scheduler=false at trial 0
and a baseline-identical trial 1 — this interleaves K independent slope-fits
of the two programs to separate a real scheduling win from fit noise.
Single-chip int8 serving has no collectives to hide, so LHS could plausibly
cost real throughput; or the outlier was a tunnel hiccup.

Usage: python scripts/chip_lhs_ab.py [B] [K]
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
K = int(sys.argv[2]) if len(sys.argv) > 2 else 4
KEY = jax.random.PRNGKey(0)

VARIANTS = [
    ("lhs=on (default)", None),
    ("lhs=off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
]


def main() -> int:
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    eng = ResNetInt8Engine(sv, arch)
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    def body(c):
        return c + 0.0 * jnp.sum(eng._forward(c))

    rates = {name: [] for name, _ in VARIANTS}
    for k in range(K):
        for name, opts in VARIANTS:
            t = time_scan_fit(body, x, n_short=5, n_long=25,
                              compiler_options=opts)
            rates[name].append(B / t)
            print(f"fit{k} {name:<18s}: {t*1e3:7.3f} ms/step -> "
                  f"{B/t:8.0f} img/s", flush=True)

    print("\n=== medians (interleaved, same process) ===", flush=True)
    for name, _ in VARIANTS:
        med = statistics.median(rates[name])
        print(f"{name:<18s}: {med:8.0f} img/s @ B={B} "
              f"(spread {min(rates[name]):.0f}-{max(rates[name]):.0f})",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
