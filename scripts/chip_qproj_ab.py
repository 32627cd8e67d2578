"""Same-process A/B: full ResNet-50 engine with use_qproj on/off (B=128).

The per-stage microbench showed qproj2d winning 1.8-4.4x per projection
block, but the first cross-process bench.py run with qproj enabled read
LOWER than the prior run — the chip drifts 20-30% between processes, so
this settles it within one process, plus per-scope traces if requested.
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
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
    engines = [
        ("qproj OFF   ", ResNetInt8Engine(sv, arch, use_qproj=False)),
        ("qproj l1_0  ", ResNetInt8Engine(sv, arch, use_qproj=True,
                                          qproj_stages=(0,))),
        ("qproj stages", ResNetInt8Engine(sv, arch, use_qproj=True,
                                          qproj_stages=(0, 1, 2, 3))),
    ]
    y0 = np.asarray(engines[0][1].forward(x0))
    for name, eng in engines[1:]:
        print(f"{name} bit-exact:",
              np.array_equal(y0, np.asarray(eng.forward(x0))), flush=True)

    x = jax.random.normal(KEY, (B, 224, 224, 3))
    for trial in range(2):
        for name, eng in engines:
            def body(c, eng=eng):
                out = eng.forward(c)
                return c + out[0, 0] * 0.0
            t = time_scan_fit(body, x, n_short=6, n_long=20)
            print(f"t{trial} {name}: {t*1e3:7.3f} ms/step -> "
                  f"{B/t:8.0f} img/s @ B={B}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
