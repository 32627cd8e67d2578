"""On-chip QAT train-step throughput: ResNet-50 INT8 fake-quant training.

The serving numbers are covered by bench.py; this measures the *training*
half of the workload (the reference's main use case — SURVEY §3.3): the full
jitted QAT step (fake-quant forward with EMA observers + fake-BN, STE
backward, adamw update) vs the plain fp32 step, same process, slope-fit.
The gap is the fake-quant overhead a QAT user pays per step.

Measurement design (hard-won on 2026-08-19): one slope-fit per variant is
NOT enough here — at B=64 the fp32 step is ~60 ms, so a 32-step spread
carries only ~2 s of signal against a tunnel whose per-call floor moves by
±0.3-0.5 s over minutes.  Sequential per-variant fits produced physically
impossible orderings twice (approx slower than exact; QAT faster than
fp32).  This script therefore builds ALL variants first, then interleaves
K independent slope-fits round-robin across variants (decorrelating the
slow drift) and reports the per-variant median.

Usage: python scripts/chip_qat_bench.py [variant-substr ...]
  With args, only variants whose label contains any substring run.
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import optax

from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.train import create_train_state, make_train_step
from qtpu.transform import convert_model

KEY = jax.random.PRNGKey(0)
BATCH = 64
FITS = 3          # independent slope-fits per variant, interleaved
N_SHORT, N_LONG = 4, 68


def build(model, batch):
    tx = optax.adamw(1e-3)
    y0 = jnp.zeros((batch,), jnp.int32)
    x2 = jax.random.normal(KEY, (2, 224, 224, 3))
    state = create_train_state(model, KEY, x2, tx)
    step = make_train_step(model, tx)

    # the train state is the scan carry: every param/opt-state/BN/observer
    # update stays live (nothing for XLA to dead-code-eliminate) — this
    # times real sequential training steps.
    def body(s, x):
        s2, _ = step(s, x, y0)
        return s2

    return state, body


def main() -> int:
    wanted = sys.argv[1:]
    variants = []
    for label, model in (
        ("fp32", get_model("resnet50", num_classes=1000, cifar_stem=False)),
        ("int8 QAT exact fake-BN",
         convert_model(get_model("resnet50", num_classes=1000,
                                 cifar_stem=False),
                       QuantPolicy.int8_qat())),
        ("int8 QAT approx fake-BN",
         convert_model(get_model("resnet50", num_classes=1000,
                                 cifar_stem=False),
                       QuantPolicy.int8_qat(fake_bn="approx"))),
        # integer-forward QAT (qtpu.ops.qat_int): int8 MXU conv forward,
        # STE backward from int8 saved codes — built against the measured
        # 3.1x fake-quant overhead; tests/test_qat_int.py proves parity.
        ("int8 QAT int-fwd exact-BN",
         convert_model(get_model("resnet50", num_classes=1000,
                                 cifar_stem=False),
                       QuantPolicy.int8_qat(qat_forward="int"))),
        ("int8 QAT int-fwd approx-BN",
         convert_model(get_model("resnet50", num_classes=1000,
                                 cifar_stem=False),
                       QuantPolicy.int8_qat(fake_bn="approx",
                                            qat_forward="int"))),
    ):
        if wanted and not any(w in label for w in wanted):
            continue
        variants.append((label, *build(model, BATCH)))
        print(f"built {label}", flush=True)

    x = jax.random.normal(KEY, (BATCH, 224, 224, 3))
    rates = {label: [] for label, *_ in variants}
    for k in range(FITS):
        for label, state, body in variants:
            t = time_scan_fit(body, state, x, n_short=N_SHORT,
                              n_long=N_LONG, reps=2)
            rates[label].append(BATCH / t)
            print(f"fit{k} {label:28s}: {BATCH / t:7.0f} img/s", flush=True)

    print("\n=== medians (interleaved, same process) ===", flush=True)
    base = None
    for label, *_ in variants:
        med = statistics.median(rates[label])
        if base is None and label == "fp32":
            base = med
        rel = f"  ({med / base:4.2f}x of fp32)" if base else ""
        print(f"{label:28s} B={BATCH}: {med:7.0f} img/s (train){rel}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
