"""Per-family serving operating points: batch sweep for every flat engine.

B=128 was tuned (and fine-swept) on the ResNet-50 headline; the other
family engines inherit it untested — but the residency regime that sets
the optimum scales with activation footprint, so smaller nets (MobileNets,
R18, the CIFAR variants) may peak at larger B and R101 at smaller B.  One
interleaved same-process sweep per family on the recommended fp32-stem
configs; the per-family argmax becomes the documented operating point
(adopt rule: >2% median win over B=128, consistent across trials).

Usage: python scripts/chip_family_operating_point.py [trials]
Receipts: bench_receipts/family_operating_point_r5.jsonl
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
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
RECEIPT = "family_operating_point_r5"

# family -> (image_size, batch candidates)
FAMILIES = {
    "resnet18": (224, (64, 128, 256)),
    "resnet34": (224, (64, 128, 256)),
    "resnet101": (224, (32, 64, 128, 192)),
    "mobilenet_v1": (224, (128, 192, 256, 384)),
    "mobilenet_v2": (224, (128, 192, 256, 384)),
    "resnet20": (32, (256, 512, 1024, 2048)),
    "resnet56": (32, (256, 512, 1024, 2048)),
}


def build(name: str, size: int):
    kw = dict(num_classes=1000 if size == 224 else 10)
    if name.startswith("resnet"):
        kw["cifar_stem"] = size <= 64
    m = get_model(name, **kw)
    x0 = jax.random.normal(KEY, (8, size, size, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq(exclude=("stem*",)))
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sv = freeze(qm, qv, x0)[1]
    if name == "mobilenet_v1":
        return MobileNetV1Int8Engine(sv, num_classes=1000)
    if name == "mobilenet_v2":
        return MobileNetV2Int8Engine(sv, num_classes=1000)
    return ResNetInt8Engine(sv, resnet_arch(name, num_classes=kw["num_classes"],
                                            image_size=size))


def main() -> int:
    trials = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    engines = {}
    for name, (size, _) in FAMILIES.items():
        engines[name] = build(name, size)
        print(f"built {name}", flush=True)

    rates = {}
    for t in range(trials):
        for name, (size, batches) in FAMILIES.items():
            eng = engines[name]
            for B in batches:
                x = jax.random.normal(KEY, (B, size, size, 3))

                def body(c, eng=eng):
                    return c + eng.forward(c)[0, 0] * 0.0

                try:
                    dt = time_scan_fit(body, x, n_short=5, n_long=15, reps=2)
                except Exception as e:               # noqa: BLE001
                    print(f"  t{t} {name} B={B}: FAIL {str(e)[:100]}",
                          flush=True)
                    log_receipt(RECEIPT, dict(trial=t, family=name, B=B,
                                              error=str(e)[:200]))
                    continue
                rates.setdefault((name, B), []).append(B / dt)
                print(f"  t{t} {name:12s} B={B:4d}: {dt*1e3:8.3f} ms "
                      f"({B/dt:9.0f} img/s)", flush=True)
                log_receipt(RECEIPT, dict(trial=t, family=name, B=B,
                                          ms=dt * 1e3, img_s=B / dt,
                                          config="int8 ptq fp32-stem"))

    print(f"\n=== medians ({trials} interleaved trials) ===", flush=True)
    for name, (size, batches) in FAMILIES.items():
        meds = {B: statistics.median(rates[(name, B)])
                for B in batches if (name, B) in rates}
        if not meds:
            continue
        best_B = max(meds, key=meds.get)
        base_B = 128 if 128 in meds else min(meds)
        line = " ".join(f"B{B}={meds[B]:.0f}" for B in sorted(meds))
        print(f"{name:12s}: {line}  -> argmax B={best_B} "
              f"({meds[best_B]/meds[base_B]:.3f}x of B={base_B})", flush=True)
        log_receipt(RECEIPT, dict(family=name, medians={str(k): v for k, v
                                                        in meds.items()},
                                  argmax_B=best_B, base_B=base_B,
                                  ratio=meds[best_B] / meds[base_B]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
