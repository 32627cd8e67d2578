"""Adjudicate the MobileNet-v1 dw_shifted="s2" default (r4 vs r5 conflict).

Round 4's e2e A/B measured v1 s2 = 1.062× over grouped and made "s2" the
engine default; round 5's receipt re-run of the SAME script measured
0.980× — the sign flipped between processes, so the margin is inside the
process-to-process variation of the A/B itself.  This script runs the
v1-only pair at higher trial count (default 7 interleaved trials) to
decide the default honestly: if the winner is not consistent across
trials/processes, the margin is a wash and the default goes to grouped
(simpler, matches v2).

Usage: python scripts/chip_dw_v1_adjudicate.py [B] [trials]
Receipts: bench_receipts/dw_v1_adjudicate_r5.jsonl
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

from qtpu.bench.receipts import log_receipt
from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
RECEIPT = "dw_v1_adjudicate_r5"


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 7
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    m = get_model("mobilenet_v1", num_classes=1000)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sv = freeze(qm, qv, x0)[1]

    engines = {
        "grouped": MobileNetV1Int8Engine(sv, num_classes=1000,
                                         dw_shifted=False),
        "s2": MobileNetV1Int8Engine(sv, num_classes=1000, dw_shifted="s2"),
    }
    y0 = np.asarray(engines["grouped"].forward(x[:8]))
    y1 = np.asarray(engines["s2"].forward(x[:8]))
    assert np.array_equal(y0, y1), "modes must be bit-exact"
    print("bit-exactness OK", flush=True)

    times = {k: [] for k in engines}
    wins = {"grouped": 0, "s2": 0}
    for t in range(trials):
        row = {}
        for name, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[name].append(dt)
            row[name] = dt
            print(f"  t{t} {name:8s}: {dt*1e3:7.3f} ms ({B/dt:8.0f} img/s)",
                  flush=True)
            log_receipt(RECEIPT, dict(trial=t, variant=name, ms=dt * 1e3,
                                      img_s=B / dt, B=B))
        wins["s2" if row["s2"] < row["grouped"] else "grouped"] += 1

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    base = statistics.median(times["grouped"])
    for name in engines:
        med = statistics.median(times[name])
        print(f"{name:8s}: {med*1e3:7.3f} ms ({B/med:8.0f} img/s)  "
              f"vs grouped {base/med:5.3f}x", flush=True)
        log_receipt(RECEIPT, dict(variant=name, median_ms=med * 1e3,
                                  median_img_s=B / med, vs_grouped=base / med,
                                  B=B))
    print(f"per-trial wins: {wins}", flush=True)
    log_receipt(RECEIPT, dict(wins_grouped=wins["grouped"],
                              wins_s2=wins["s2"], trials=trials))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
