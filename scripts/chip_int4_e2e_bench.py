"""INT4 e2e operating point: ResNet-50 INT4w/INT8a vs INT8 same-process.

BASELINE.json's headline metric names "INT8/INT4 images/sec/chip on
ResNet-50"; bench.py covers INT8.  This measures the INT4-weight config
(config-5 shape: stem*/fc excluded, per VERDICT r1 #6) through the flat
engine in the SAME process as an INT8 run, so the comparison is valid under
the chip's 20-30% cross-process drift (verify SKILL.md).

Expectation to verify: on the XLA path int4 weights are nibble-unpacked to
int8 once at dispatch (qtpu/serve/fused_ops.py unpacked_kernel), so INT4 is
a storage/accuracy point, not a throughput win — the kernel-level HBM win
(in-kernel unpack, qmatmul) only pays when weight-bandwidth-bound, which
ResNet-50 @ B=128 is not (BASELINE.md round-2 finding 1).
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
ARCH = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
            cifar_stem=False, num_classes=1000)


def build_engine(policy):
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, policy)
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    _, sv = freeze(qm, qv, x0)
    return ResNetInt8Engine(sv, ARCH)


def measure(eng, batch=128):
    x = jax.random.normal(KEY, (batch, 224, 224, 3))

    def body(c):
        return c + eng.forward(c)[0, 0] * 0.0

    t = time_scan_fit(body, x, n_short=5, n_long=20)
    return batch / t


def main() -> int:
    for label, pol in (
        ("int8 (full)", QuantPolicy.int8_ptq()),
        ("int4w/int8a (stem*/fc excluded, config-5 shape)",
         QuantPolicy.int4_weight_only(exclude=("stem*", "fc"))),
    ):
        eng = build_engine(pol)
        rate = measure(eng)
        print(f"{label:50s}: {rate:8.0f} img/s @ B=128", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
