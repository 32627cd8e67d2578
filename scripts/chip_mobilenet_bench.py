"""On-chip MobileNet INT8 throughput (flat engines), post-epilogue-folding.

Round 1 measured 16.9k img/s @ B=64 (v2).  Round 2 folded every requant
epilogue (qops.epilogue_coeffs) — this re-measures the engine and sweeps
batch size, one process, slope-fit.  Round 3: also benches the MobileNet-v1
flat engine (pass ``v1`` as argv[1]; default v2).
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def main() -> int:
    variant = sys.argv[1] if len(sys.argv) > 1 else "v2"
    model = get_model(f"mobilenet_{variant}", num_classes=1000)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    if variant == "v1":
        from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine
        eng = MobileNetV1Int8Engine(sv, num_classes=1000)
    else:
        eng = MobileNetV2Int8Engine(sv, num_classes=1000)
    y = eng.forward(x0)
    print("forward ok:", y.shape, flush=True)
    for B in (64, 128, 256):
        x = jax.random.normal(KEY, (B, 224, 224, 3))
        def body(c):
            out = eng.forward(c)
            return c + out[0, 0] * 0.0
        t = time_scan_fit(body, x, n_short=6, n_long=20)
        print(f"B={B}: {t*1e3:7.3f} ms/step -> {B/t:8.0f} img/s", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
