"""Same-process e2e A/B: excluded-stem conv in fp32 vs bf16.

Follow-up to chip_stem_excl_ab.py (fp32 stem = +2.6% over int8, the
round-4 recommended config): the excluded stem's conv still moves its
B=128/224² input at 4 bytes/px.  bf16 halves that (and runs the MXU bf16
path) while its rounding noise is far below the int8 quantization step
that immediately follows (quantize_act onto the first block's grid).
This bench decides the engine's stem_dtype default and reports the argmax
delta between the two dtypes on shared inputs.

Usage: python scripts/chip_stem_dtype_ab.py [B] [trials]
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
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
ARCH = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
            cifar_stem=False, num_classes=1000)


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq(exclude=("stem*",)))
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sv = freeze(qm, qv, x0)[1]

    engines = {
        "f32-stem": ResNetInt8Engine(sv, ARCH, stem_dtype=jnp.float32),
        "bf16-stem": ResNetInt8Engine(sv, ARCH, stem_dtype=jnp.bfloat16),
    }

    ya = np.asarray(engines["f32-stem"].forward(x[:16]))
    yb = np.asarray(engines["bf16-stem"].forward(x[:16]))
    agree = float((ya.argmax(-1) == yb.argmax(-1)).mean())
    rel = float(np.linalg.norm(ya - yb) / np.linalg.norm(ya))
    print(f"argmax agreement f32 vs bf16 stem: {agree:.4f}  rel={rel:.2e}",
          flush=True)
    receipt = "stem_dtype_ab_r5"
    log_receipt(receipt, dict(script="chip_stem_dtype_ab.py", B=B,
                              trials=trials, argmax_agreement=agree,
                              rel_diff=rel))

    times = {k: [] for k in engines}
    for t in range(trials):
        for name, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[name].append(dt)
            print(f"  t{t} {name:10s}: {dt*1e3:7.3f} ms ({B/dt:8.0f} img/s)",
                  flush=True)
            log_receipt(receipt, dict(trial=t, variant=name, ms=dt * 1e3,
                                      img_s=B / dt))

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    base = statistics.median(times["f32-stem"])
    for name in engines:
        med = statistics.median(times[name])
        print(f"{name:10s}: {med*1e3:7.3f} ms ({B/med:8.0f} img/s)  "
              f"vs f32 {base/med:5.3f}x", flush=True)
        log_receipt(receipt, dict(variant=name, median_ms=med * 1e3,
                                  median_img_s=B / med,
                                  vs_f32=base / med))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
