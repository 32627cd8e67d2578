"""Re-sweep the headline operating point on the ROUND-5 program.

B=128 + default scoped-VMEM was chosen by chip_vmem_sweep.py on the round-2
full-int8 program; the headline program has since changed (fp32 stem — the
recommended serving config; MNv1 dw="s2").  Per the repo's own rule that
per-shape/per-config wins don't compose, the operating point must be
re-measured on the CURRENT program before being quoted (VERDICT r4 #5).

Same method as chip_vmem_sweep.py (scan slope-fit per cell, chain compiled
WITH the compiler options), but: the fp32-stem engine, B ∈ {64,128,256} ×
scoped-VMEM {default, 32 MB, 64 MB}, 2 interleaved trials per cell
(compiles cached after trial 0), per-cell JSONL receipts.

Usage: python scripts/chip_operating_point_r5.py
Receipts: bench_receipts/operating_point_r5.jsonl
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.receipts import log_receipt
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
RECEIPT = "operating_point_r5"
TRIALS = 2


def main() -> int:
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    # the round-4+ recommended serving config: fp32 stem
    qm = convert_model(model, QuantPolicy.int8_ptq(exclude=("stem*",)))
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    eng = ResNetInt8Engine(sv, arch)

    compiled = {}

    def compiled_chain(B, length, kib):
        k = (B, length, kib)
        if k not in compiled:
            x = jax.ShapeDtypeStruct((B, 224, 224, 3), jnp.float32)

            def chain_fn(c0):
                def f(c, _):
                    out = eng._forward(c)
                    return c + out[0, 0] * 0.0, ()
                c, _ = jax.lax.scan(f, c0, None, length=length)
                return jnp.sum(c.astype(jnp.float32))

            opts = ({} if kib is None
                    else {"xla_tpu_scoped_vmem_limit_kib": str(kib)})
            compiled[k] = jax.jit(chain_fn).lower(x).compile(
                compiler_options=opts or None)
        return compiled[k]

    def slope_fit(B, kib, n_short=6, n_long=20, reps=3):
        x = jax.random.normal(KEY, (B, 224, 224, 3))

        def total(length):
            fn = compiled_chain(B, length, kib)
            np.asarray(fn(x))          # warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn(x))
                best = min(best, time.perf_counter() - t0)
            return best

        ts, tl = total(n_short), total(n_long)
        return max((tl - ts) / (n_long - n_short), 1e-9)

    cells = [(B, kib) for B in (64, 128, 256)
             for kib in (None, 32768, 65536)]
    rates = {c: [] for c in cells}
    for t in range(TRIALS):
        for B, kib in cells:
            try:
                dt = slope_fit(B, kib)
            except Exception as e:                   # noqa: BLE001
                print(f"  t{t} B={B} kib={kib}: FAIL {str(e)[:120]}",
                      flush=True)
                log_receipt(RECEIPT, dict(trial=t, B=B, scoped_kib=kib,
                                          error=str(e)[:200]))
                continue
            rates[(B, kib)].append(B / dt)
            print(f"  t{t} B={B:3d} kib={str(kib or 'default'):7s}: "
                  f"{dt*1e3:7.3f} ms -> {B/dt:8.0f} img/s", flush=True)
            log_receipt(RECEIPT, dict(trial=t, B=B, scoped_kib=kib,
                                      ms=dt * 1e3, img_s=B / dt,
                                      program="fp32-stem r5 headline"))

    print(f"\n=== medians ({TRIALS} interleaved trials) ===", flush=True)
    best = None
    for (B, kib), rs in rates.items():
        if not rs:
            continue
        med = statistics.median(rs)
        print(f"B={B:3d} kib={str(kib or 'default'):7s}: {med:8.0f} img/s",
              flush=True)
        log_receipt(RECEIPT, dict(B=B, scoped_kib=kib, median_img_s=med))
        if best is None or med > best[2]:
            best = (B, kib, med)
    if best:
        print(f"OPERATING POINT: B={best[0]} scoped_kib="
              f"{best[1] or 'default'} ({best[2]:.0f} img/s)", flush=True)
        log_receipt(RECEIPT, dict(winner_B=best[0], winner_kib=best[1],
                                  winner_img_s=best[2]))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
