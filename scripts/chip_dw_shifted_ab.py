"""Same-process e2e A/B: depthwise as shifted elementwise FMAs vs grouped conv.

The round-4 per-shape roofline sweep (chip_conv_shape_roofline.py) shows
the shifted form (qops.qdepthwise_shifted — pure XLA, bit-exact, no custom
call) beating XLA's grouped conv on STRIDE-2 depthwise shapes while losing
on stride-1.  This bench answers the e2e question for both MobileNets at
the serving operating point: engines with dw_shifted OFF / "s2" (strided
only) / True (all), built first, interleaved slope-fits (drift discipline).

Usage: python scripts/chip_dw_shifted_ab.py [B] [trials]
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
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def freeze_vars(name):
    model = get_model(name, num_classes=1000)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    return freeze(qm, qv, x0)[1]


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    engines = {}
    for fam, cls in (("mobilenet_v2", MobileNetV2Int8Engine),
                     ("mobilenet_v1", MobileNetV1Int8Engine)):
        sv = freeze_vars(fam)
        for mode in (False, "s2", True):
            engines[(fam, str(mode))] = cls(sv, num_classes=1000,
                                            dw_shifted=mode)

    # bit-exactness: all three modes must agree exactly per family
    for fam in ("mobilenet_v2", "mobilenet_v1"):
        y0 = np.asarray(engines[(fam, "False")].forward(x[:8]))
        for mode in ("s2", "True"):
            y = np.asarray(engines[(fam, mode)].forward(x[:8]))
            assert np.array_equal(y0, y), (fam, mode)
    print("bit-exactness OK (all modes agree)", flush=True)

    times = {k: [] for k in engines}
    for t in range(trials):
        for key, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[key].append(dt)
            print(f"  t{t} {key[0]:13s} dw={key[1]:5s}: {dt*1e3:7.3f} ms "
                  f"({B/dt:8.0f} img/s)", flush=True)
            log_receipt("dw_shifted_ab_r5", dict(trial=t, family=key[0],
                                                 dw=key[1], ms=dt * 1e3,
                                                 img_s=B / dt, B=B))

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    for fam in ("mobilenet_v2", "mobilenet_v1"):
        base = statistics.median(times[(fam, "False")])
        for mode in ("False", "s2", "True"):
            med = statistics.median(times[(fam, mode)])
            print(f"{fam:13s} dw={mode:5s}: {med*1e3:7.3f} ms "
                  f"({B/med:8.0f} img/s)  vs grouped {base/med:5.3f}x",
                  flush=True)
            log_receipt("dw_shifted_ab_r5", dict(family=fam, dw=mode,
                                                 median_ms=med * 1e3,
                                                 median_img_s=B / med,
                                                 vs_grouped=base / med, B=B))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
