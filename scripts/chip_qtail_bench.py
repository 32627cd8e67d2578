"""On-chip: ResNet-50 engine with fused tail kernel (qtail) vs XLA path.

Builds the frozen int8 ResNet-50 once, then slope-fit-times the full
forward with use_qtail on/off in ONE process (the chip drifts 20-30%
between processes).  Also asserts the two paths agree bit-exactly on the
chip before timing.
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
from qtpu.serve.experimental import \
        ExperimentalResNetInt8Engine as ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KEY = jax.random.PRNGKey(0)


def main() -> int:
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    eng_x = ResNetInt8Engine(sv, arch, use_qtail=False)
    eng_t = ResNetInt8Engine(sv, arch, use_qtail=True)
    print("qtail blocks:", sorted(eng_t._qtail_prep))

    y_x = np.asarray(eng_x.forward(x0))
    y_t = np.asarray(eng_t.forward(x0))
    exact = np.array_equal(y_x, y_t)
    print(f"bit-exact on chip: {exact}"
          + ("" if exact else f"  (max abs diff {np.abs(y_x - y_t).max()},"
             f" rel {np.linalg.norm(y_t - y_x) / np.linalg.norm(y_x):.2e})"))

    x = jax.random.normal(KEY, (B, 224, 224, 3))
    for name, eng in [("xla ", eng_x), ("qtail", eng_t)]:
        def body(c, eng=eng):
            out = eng.forward(c)
            return c + out[0, 0] * 0.0
        t = time_scan_fit(body, x, n_short=6, n_long=20)
        print(f"{name}: {t*1e3:7.3f} ms/step  ->  {B/t:8.0f} img/s @ B={B}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
