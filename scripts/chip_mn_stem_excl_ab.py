"""Same-process e2e A/B: MobileNet-v1/v2 full-int8 vs fp32-stem engines.

Round 4 measured the reference-canonical first-layer exclusion as a
consistent WIN on ResNet-50 (+2.6% e2e at B=128, strictly better top-1 —
chip_stem_excl_ab.py): the 7x7 Ci=3 stem is the chip's worst int8 shape.
The MobileNet stems are 3x3 Ci=3 stride-2 — also lane-starved (3/128 MXU
lanes) — and round 5 made stem/fc exclusions run fp32 IN-ENGINE for the
MobileNet families (VERDICT r4 #4).  This A/B decides whether
``exclude=("stem*",)`` becomes the recommended MobileNet serving config.

All engines are built first; trials interleave variants round-robin
(same-process slope fits, the only valid A/B form on this drifting chip).

Usage: python scripts/chip_mn_stem_excl_ab.py [B] [trials]
Receipts: bench_receipts/mn_stem_excl_ab_r5.jsonl
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.receipts import log_receipt
from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
RECEIPT = "mn_stem_excl_ab_r5"


def build(model_name: str, exclude):
    m = get_model(model_name, num_classes=1000)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq(exclude=exclude))
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sv = freeze(qm, qv, x0)[1]
    cls = (MobileNetV2Int8Engine if model_name == "mobilenet_v2"
           else MobileNetV1Int8Engine)
    return cls(sv, num_classes=1000)


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    engines = {}
    for fam in ("mobilenet_v1", "mobilenet_v2"):
        engines[f"{fam}/full-int8"] = build(fam, ())
        engines[f"{fam}/fp32-stem"] = build(fam, ("stem*",))
        ya = np.asarray(engines[f"{fam}/full-int8"].forward(x[:16]))
        yb = np.asarray(engines[f"{fam}/fp32-stem"].forward(x[:16]))
        agree = float((ya.argmax(-1) == yb.argmax(-1)).mean())
        print(f"{fam}: full vs fp32-stem argmax agreement {agree:.3f} "
              f"(different programs — accuracy deltas come from configs, "
              f"not this)", flush=True)

    times = {k: [] for k in engines}
    for t in range(trials):
        for name, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[name].append(dt)
            print(f"  t{t} {name:24s}: {dt*1e3:7.3f} ms "
                  f"({B/dt:8.0f} img/s)", flush=True)
            log_receipt(RECEIPT, dict(trial=t, variant=name, ms=dt * 1e3,
                                      img_s=B / dt, B=B))

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    for fam in ("mobilenet_v1", "mobilenet_v2"):
        base = statistics.median(times[f"{fam}/full-int8"])
        for kind in ("full-int8", "fp32-stem"):
            med = statistics.median(times[f"{fam}/{kind}"])
            print(f"{fam}/{kind:10s}: {med*1e3:7.3f} ms "
                  f"({B/med:8.0f} img/s)  vs full {base/med:5.3f}x",
                  flush=True)
            log_receipt(RECEIPT, dict(variant=f"{fam}/{kind}",
                                      median_ms=med * 1e3,
                                      median_img_s=B / med,
                                      vs_full=base / med, B=B))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
