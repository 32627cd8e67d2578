"""Same-process e2e A/B: full-int8 vs reference-canonical first/last fp32.

The round-4 int4 latency bench's control variant (int8 with the int4
config's stem*/fc exclusions) beat the full-int8 engine at EVERY batch
size — B=8 1.30x, B=128 1.05x — because the 7x7 stem is the worst int8
shape on the chip (Ci=3 occupies 3/128 MXU lanes; per-shape sweep: 3.4%
of roofline standalone, 45% traced) while XLA's fp32/bf16 conv for the
stem shape is comparatively fine.  Excluding first/last from quantization
is the REFERENCE'S canonical idiom (convert_model(net, exclude=[first,
last]) — SURVEY §1.2 R1) and strictly improves accuracy, so if the win
is robust this becomes the recommended serving config.

This bench isolates the decision with more trials: full-int8 vs
exclude=("stem*",) vs exclude=("stem*", "fc") at B=128 (and optionally
other batches), engines built first, interleaved slope-fits.

Usage: python scripts/chip_stem_excl_ab.py [B] [trials]
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
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
ARCH = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
            cifar_stem=False, num_classes=1000)


def freeze_vars(policy):
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, policy)
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    return freeze(qm, qv, x0)[1]


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    engines = {
        "full-int8": ResNetInt8Engine(
            freeze_vars(QuantPolicy.int8_ptq()), ARCH),
        "excl-stem": ResNetInt8Engine(
            freeze_vars(QuantPolicy.int8_ptq(exclude=("stem*",))), ARCH),
        "excl-stem-fc": ResNetInt8Engine(
            freeze_vars(QuantPolicy.int8_ptq(exclude=("stem*", "fc"))),
            ARCH),
    }

    # sanity: all serve the same argmax on shared input (same fp32 model,
    # different quantization -> argmax may differ on random weights; just
    # report agreement, don't assert)
    y = {k: np.asarray(e.forward(x[:8])) for k, e in engines.items()}
    agree = np.mean(y["full-int8"].argmax(-1) == y["excl-stem-fc"].argmax(-1))
    print(f"argmax agreement full vs excl-stem-fc: {agree:.3f}", flush=True)

    times = {k: [] for k in engines}
    for t in range(trials):
        for name, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[name].append(dt)
            print(f"  t{t} {name:12s}: {dt*1e3:7.3f} ms ({B/dt:8.0f} img/s)",
                  flush=True)
            log_receipt("stem_excl_ab_r5", dict(trial=t, variant=name,
                                                ms=dt * 1e3, img_s=B / dt,
                                                B=B))

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    base = statistics.median(times["full-int8"])
    for name in engines:
        med = statistics.median(times[name])
        print(f"{name:12s}: {med*1e3:7.3f} ms ({B/med:8.0f} img/s)  "
              f"vs full {base/med:5.3f}x", flush=True)
        log_receipt("stem_excl_ab_r5", dict(variant=name,
                                            median_ms=med * 1e3,
                                            median_img_s=B / med,
                                            vs_full=base / med, B=B))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
