"""Same-process throughput A/B: forward(f32 images) vs forward_codes(int8).

The stem scope includes the on-device f32 quantize of the input image
(128*224*224*3 = 19.3M elements at B=128).  Production int8 ingest
(native host preprocess -> stem-grid codes, 4x less transfer) removes that
work from the device program entirely.  This measures what the device-side
program saves — the legitimate serving configuration for a host that
preprocesses (qtpu/data/native.py).

Usage: python scripts/chip_codes_throughput_ab.py [B]
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
from qtpu.serve.resnet_engine import ResNetInt8Engine
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
    eng = ResNetInt8Engine(sv, arch)

    # parity: forward(x) == forward_codes(quantize(x)) by construction
    x_chk = jax.random.normal(KEY, (8, 224, 224, 3))
    from qtpu.ops import qops
    from qtpu.serve.fused_ops import grid_of
    stem = eng._node("stem")
    codes_chk = qops.quantize_act(x_chk, stem["act_scale"], stem["act_zp"],
                                  symmetric=grid_of(stem)[2])
    y_f = np.asarray(eng.forward(x_chk))
    y_c = np.asarray(eng.forward_codes(codes_chk))
    print("bit-exact:", np.array_equal(y_f, y_c), flush=True)

    x = jax.random.normal(KEY, (B, 224, 224, 3))
    codes = qops.quantize_act(x, stem["act_scale"], stem["act_zp"],
                              symmetric=grid_of(stem)[2])

    def body_f(c):
        return c + 0.0 * jnp.sum(eng._forward(c))

    # int8 carry: xor a data-dependent zero so the scan iterations chain
    def body_codes(c):
        out = eng._forward(c, pre_quantized=True)
        return c ^ (out[0, 0] * 0.0).astype(jnp.int8)

    for trial in range(2):
        tf_ = time_scan_fit(body_f, x, n_short=5, n_long=20)
        tc_ = time_scan_fit(body_codes, codes, n_short=5, n_long=20)
        print(f"t{trial} f32-ingest : {tf_*1e3:7.3f} ms/step -> "
              f"{B/tf_:8.0f} img/s @ B={B}", flush=True)
        print(f"t{trial} code-ingest: {tc_*1e3:7.3f} ms/step -> "
              f"{B/tc_:8.0f} img/s @ B={B}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
