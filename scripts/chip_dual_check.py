"""On-chip check: ResNet-50 engine with qmatmul_dual projection blocks.

1. bit-parity of the full forward vs the use_dual=False engine (same frozen
   weights) — fp32 logits must match exactly (same math, same grouping);
2. within-one-process slope-fit throughput A/B (chip drifts 20-30% across
   processes; see .claude/skills/verify/SKILL.md).

Run on the TPU: ``python scripts/chip_dual_check.py [batch]``.
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


def main() -> int:
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    key = jax.random.PRNGKey(0)
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(key, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(key, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)

    eng_ref = ResNetInt8Engine(sv, arch, use_dual=False)
    eng_dual = ResNetInt8Engine(sv, arch, use_dual=True)
    assert eng_dual.use_dual, "dual path inactive (not on TPU?)"

    xs = jax.random.normal(jax.random.fold_in(key, 1), (32, 224, 224, 3))
    a = np.asarray(eng_ref.forward(xs))
    b = np.asarray(eng_dual.forward(xs))
    exact = np.array_equal(a, b)
    rel = float(np.max(np.abs(a - b) / (np.abs(a) + 1e-6)))
    agree = float((a.argmax(-1) == b.argmax(-1)).mean())
    print(f"parity: exact={exact} max_rel={rel:.3e} argmax_agree={agree}")

    x = jax.random.normal(jax.random.fold_in(key, 2), (batch, 224, 224, 3))
    for name, eng in [("xla ", eng_ref), ("dual", eng_dual)]:
        def body(c, _eng=eng):
            return c + 0.0 * jnp.sum(_eng._forward(c))
        t = time_scan_fit(body, x, n_short=5, n_long=20)
        print(f"{name}: {t*1e6:9.1f} us/step  {batch/t:9.0f} img/s")
    return 0 if exact or (agree == 1.0 and rel < 1e-3) else 1


if __name__ == "__main__":
    raise SystemExit(main())
