"""INT4 at its operating point: small-batch latency vs INT8 (VERDICT r3 #5).

The headline metric names "INT8/INT4 images/sec/chip" but round 2/3 only
measured INT4 at B=128, where ResNet-50 is not weight-bound and INT4 ==
INT8 speed (BASELINE.md).  INT4's value proposition is the WEIGHT-traffic-
bound regime — small serving batches, where each step reads the full 25 MB
(int8) vs 14 MB (int4-packed quantized layers) of weights against little
activation work.  This bench measures, same-process, at B in {1,4,8,32,128}:

* int8 engine (XLA path, the product default);
* int4w/int8a engine, config-5 shape (stem*/fc excluded), XLA path —
  NOTE the mechanism: the engine's weights are jit closure CONSTANTS, so
  unpack_int4 runs at trace time and XLA embeds the UNPACKED int8 weights
  in the executable — the XLA int4 path has int8 weight traffic (and int8
  speed) by construction; the packed-on-disk/in-tree footprint win is the
  checkpoint, not serving HBM;
* optionally (--packed) the Pallas packed-GEMM path (in-kernel unpack,
  halves weight HBM traffic — the form that won 1.32x standalone in the
  weight-bound regime, scripts/chip_int4_unpack_bench.py) for the 1x1
  GEMMs whose lane shapes allow it.

All variants are built first and the B-sweep interleaves them round-robin
(the drift discipline from chip_qat_bench.py).
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

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


def measure(eng, B):
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    def body(c):
        return c + eng.forward(c)[0, 0] * 0.0

    # longer chains at small B: the marginal chain must dwarf the ~25 ms
    # tunnel launch floor (B=1 step ~0.5 ms -> 90-iter margin ~45 ms)
    n_short, n_long = (10, 100) if B <= 8 else ((8, 40) if B <= 32
                                                else (5, 20))
    return time_scan_fit(body, x, n_short=n_short, n_long=n_long, reps=2)


def main() -> int:
    packed = "--packed" in sys.argv
    sv8 = freeze_vars(QuantPolicy.int8_ptq())
    sv4 = freeze_vars(QuantPolicy.int4_weight_only(exclude=("stem*", "fc")))
    # control: int8 with the SAME fp32 exclusions as the int4 config — an
    # excluded layer runs fp32 (nn/config.py), so without this control any
    # int4-vs-int8 delta could be the fp32 stem/fc, not the weight width.
    sv8x = freeze_vars(QuantPolicy.int8_ptq(exclude=("stem*", "fc")))
    variants = [("int8", ResNetInt8Engine(sv8, ARCH)),
                ("int8-excl", ResNetInt8Engine(sv8x, ARCH)),
                ("int4w-xla", ResNetInt8Engine(sv4, ARCH))]
    if packed:
        variants.append(
            ("int4w-packed-pallas",
             ResNetInt8Engine(sv4, ARCH, use_pallas=True, packed_int4=True)))

    batches = (1, 4, 8, 32, 128)
    rows = {name: {} for name, _ in variants}
    for trial in range(2):                  # interleaved: drift-robust
        for B in batches:
            for name, eng in variants:
                t = measure(eng, B)
                rows[name].setdefault(B, []).append(t)
                print(f"  trial{trial} {name:20s} B={B:3d}: "
                      f"{t*1e3:7.3f} ms/step ({B/t:8.0f} img/s)", flush=True)
                log_receipt("int4_latency_r5", dict(trial=trial, variant=name,
                                                    B=B, ms=t * 1e3,
                                                    img_s=B / t))

    print("\n| B | " + " | ".join(n for n, _ in variants) +
          " | int4w vs int8 |", flush=True)
    for B in batches:
        t8 = min(rows["int8"][B])
        cells = []
        for name, _ in variants:
            t = min(rows[name][B])
            cells.append(f"{t*1e3:.3f} ms ({B/t:.0f} img/s)")
        best4 = min(min(rows[n][B]) for n, _ in variants
                    if n.startswith("int4"))
        print(f"| {B} | " + " | ".join(cells) +
              f" | {t8/best4:.2f}x |", flush=True)
        for name, _ in variants:
            t = min(rows[name][B])
            log_receipt("int4_latency_r5", dict(variant=name, B=B,
                                                best_ms=t * 1e3,
                                                best_img_s=B / t,
                                                vs_int8=t8 / t))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
