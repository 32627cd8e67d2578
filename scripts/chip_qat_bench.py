"""On-chip QAT train-step throughput: ResNet-50 INT8 fake-quant training.

The serving numbers are covered by bench.py; this measures the *training*
half of the workload (the reference's main use case — SURVEY §3.3): the full
jitted QAT step (fake-quant forward with EMA observers + fake-BN, STE
backward, adamw update) vs the plain fp32 step, same process, slope-fit.
The gap is the fake-quant overhead a QAT user pays per step.

Usage: python scripts/chip_qat_bench.py [variant-substr ...]
  With args, only variants whose label contains any substring run (e.g.
  ``approx`` reruns the two approx rows; ``fp32 exact approx`` anchors the
  sim-side trio in one process).
"""
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


def bench_step(model, batch):
    tx = optax.adamw(1e-3)
    x0 = jax.random.normal(KEY, (batch, 224, 224, 3))
    y0 = jnp.zeros((batch,), jnp.int32)
    state = create_train_state(model, KEY, x0[:2], tx)
    step = make_train_step(model, tx)

    # the train state is the scan carry: every param/opt-state/BN/observer
    # update stays live (nothing for XLA to dead-code-eliminate) — this
    # times real sequential training steps.
    def body(s, x):
        s2, _ = step(s, x, y0)
        return s2

    # n_long-n_short must put the slope well above the tunnel's launch-time
    # noise (measured up to ~±0.5 s/call on busy days, with a fixed per-call
    # overhead that reached ~14 s on 2026-08-18 — slope-fit cancels the
    # fixed part, the spread must out-scale the noise).  The 4/20 spread
    # produced one degenerate (negative-slope) fit on 2026-08-19; 4/36
    # doubles the signal.
    t = time_scan_fit(body, state, x0, n_short=4, n_long=36)
    return batch / t


def main() -> int:
    wanted = sys.argv[1:]
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
        for batch in (64,):
            rate = bench_step(model, batch)
            print(f"{label:28s} B={batch}: {rate:7.0f} img/s (train)",
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
