"""On-chip verification of the fused bottleneck kernel (qblock).

Builds the full ResNet-50 int8 engine twice (with / without qblock), checks
bit-parity of the logits on the real chip, and slope-fit times both paths in
one process (chip drift: only in-process comparisons are valid).
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


def main() -> int:
    key = jax.random.PRNGKey(0)
    print("platform:", jax.devices()[0].platform, flush=True)

    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(key, (8, 224, 224, 3))
    qmodel = convert_model(model, QuantPolicy.int8_ptq())
    qvars = jax.jit(qmodel.init, static_argnames="train")(key, x0, train=True)
    qvars = calibrate(qmodel, dict(qvars), [x0])
    _, svars = freeze(qmodel, qvars, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)

    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    x = jax.random.normal(key, (batch, 224, 224, 3))

    eng_ref = ResNetInt8Engine(svars, arch, use_qblock=False)
    eng_fused = ResNetInt8Engine(svars, arch, use_qblock=True)
    print("qblock blocks prepared:", sorted(eng_fused._qblock_prep),
          flush=True)

    y_ref = np.asarray(jax.device_get(eng_ref.forward(x)))
    print("ref forward ok", flush=True)
    y_fused = np.asarray(jax.device_get(eng_fused.forward(x)))
    print("fused forward ok", flush=True)
    mismatch = np.sum(y_ref != y_fused)
    print(f"bit-parity: {mismatch}/{y_ref.size} logits differ", flush=True)
    agree = np.mean(np.argmax(y_ref, -1) == np.argmax(y_fused, -1))
    rel = (np.linalg.norm(y_fused - y_ref) / np.linalg.norm(y_ref))
    print(f"argmax agreement {agree:.4f}, rel err {rel:.3e}", flush=True)

    ops = 2 * 4.089e9 * batch
    for name, eng in [("ref  ", eng_ref), ("qblock", eng_fused)]:
        def body(c, e=eng):
            return c + 0.0 * jnp.sum(e._forward(c))
        dt = time_scan_fit(body, x, n_short=5, n_long=20)
        print(f"{name}: {dt*1e3:8.3f} ms/step  {batch/dt:9.1f} img/s  "
              f"{ops/dt/1e12:6.1f} TOPS  "
              f"{batch/dt/48178.0*100:5.1f}% roofline", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
