"""Flat-engine e2e throughput for the gluoncv CIFAR variants: ResNet-20/56.

The reference's canonical CIFAR-10 example models (SURVEY §1.2 R6
"cifar variants" — gluoncv cifar_resnet20/56_v1) added to the zoo in
round 5: 3x3/1 stem, width-16 stages (16/32/64), BasicBlock.  Measured on
the recommended fp32-stem serving config at CIFAR geometry (32x32), same-
process slope fits, interleaved trials; resnet18-cifar (width 64) is
included as the established comparison point (chip_resnet18_bench.py).

Usage: python scripts/chip_cifar_resnet_bench.py [B] [trials]
Receipts: bench_receipts/cifar_resnet_r5.jsonl
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from qtpu.bench.receipts import log_receipt
from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.dispatch import resnet_arch
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
RECEIPT = "cifar_resnet_r5"


def build(name: str):
    m = get_model(name, num_classes=10, cifar_stem=True)
    x0 = jax.random.normal(KEY, (8, 32, 32, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq(exclude=("stem*",)))
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sv = freeze(qm, qv, x0)[1]
    return ResNetInt8Engine(sv, resnet_arch(name, num_classes=10,
                                            image_size=32))


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    x = jax.random.normal(KEY, (B, 32, 32, 3))

    engines = {name: build(name)
               for name in ("resnet20", "resnet56", "resnet18")}
    times = {k: [] for k in engines}
    for t in range(trials):
        for name, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[name].append(dt)
            print(f"  t{t} {name:10s}: {dt*1e3:7.3f} ms ({B/dt:8.0f} img/s)",
                  flush=True)
            log_receipt(RECEIPT, dict(trial=t, variant=name, ms=dt * 1e3,
                                      img_s=B / dt, B=B,
                                      config="int8 ptq fp32-stem cifar32"))

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    for name in engines:
        med = statistics.median(times[name])
        print(f"{name:10s}: {med*1e3:7.3f} ms ({B/med:8.0f} img/s)",
              flush=True)
        log_receipt(RECEIPT, dict(variant=name, median_ms=med * 1e3,
                                  median_img_s=B / med, B=B))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
