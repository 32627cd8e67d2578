"""Same-process XLA compiler-options sweep on the ResNet-50 int8 engine.

With kernel injection measured out (BASELINE.md round-3), the remaining e2e
headroom (~26% of the per-layer ideal) is XLA fusion/scheduling overhead.
Per-computation ``compiler_options`` make flag A/Bs possible INSIDE one
process — no cross-process drift.  Probes a curated list of TPU backend
options; invalid/unknown keys are skipped with their error.

Usage: python scripts/chip_xla_options_sweep.py [B]
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

CANDIDATES = [
    ("baseline", {}),
    ("lhs=off", {"xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ("aggressive-fusion",
     {"xla_tpu_enable_multi_level_nested_while_loop_fusion": "true"}),
    ("rwb-fusion-off", {"xla_tpu_rwb_fusion": "false"}),
    ("licm-2x", {"xla_tpu_licm_size_inflation_ratio": "2.0"}),
    ("dot-sr-off", {"xla_tpu_enable_dot_strength_reduction": "false"}),
    ("copy-elision-off", {"xla_tpu_copy_with_multiple_users_elision": "false"}),
    ("async-ag", {"xla_tpu_enable_async_collective_fusion": "true"}),
    ("vmem-48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
    ("flm-sched",
     {"xla_tpu_enable_all_experimental_scheduler_features": "true"}),
    ("bundle-opt", {"xla_tpu_enable_experimental_fusion_cost_model": "true"}),
]


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
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    y0 = None

    # body traces eng._forward INLINE (unjitted) so compiler_options land on
    # the one top-level jit of the timing chain (nested-jit options are a
    # JAX error).
    def body(c):
        return c + 0.0 * jnp.sum(eng._forward(c))

    good = []
    for name, opts in CANDIDATES:
        try:
            fn = jax.jit(eng._forward, compiler_options=opts or None)
            yy = np.asarray(fn(x0[:8]))          # validate option + parity
            if y0 is None:
                y0 = yy
            ok = bool((yy.argmax(-1) == y0.argmax(-1)).all())
            good.append((name, opts))
            print(f"compiled {name}: argmax-parity={ok}", flush=True)
        except Exception as e:
            print(f"SKIP {name}: {str(e)[:140]}", flush=True)

    for trial in range(2):
        for name, opts in good:
            t = time_scan_fit(body, x, n_short=5, n_long=15,
                              compiler_options=opts or None)
            print(f"t{trial} {name:<18s}: {t*1e3:7.3f} ms/step -> "
                  f"{B/t:8.0f} img/s @ B={B}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
