"""On-chip sweep: XLA scoped-VMEM budget + batch size for the ResNet engine.

Round-2 established that XLA-TPU's scoped-VMEM (S(1)) activation residency
is the engine's real accelerator (its fusions read at >HBM-peak effective
rates, and breaking residency with custom calls costs more than 2x-faster
kernels recover).  Two cheap levers follow:

  1. raise the scoped-vmem budget per compile
     (compiler_options {"xla_tpu_scoped_vmem_limit_kib": N}) so MORE
     activations stay VMEM-resident;
  2. batch size (residency pressure scales with B).

One process; the scan chain itself is compiled with the options (slope-fit
between two chain lengths cancels launch overhead, per verify SKILL).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

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

    def compiled_chain(x, length, opts):
        def chain_fn(c0):
            def f(c, _):
                out = eng._forward(c)
                return c + out[0, 0] * 0.0, ()
            c, _ = jax.lax.scan(f, c0, None, length=length)
            return jnp.sum(c.astype(jnp.float32))
        return jax.jit(chain_fn).lower(x).compile(
            compiler_options=opts or None)

    def run(x, opts, n_short=6, n_long=20, reps=3):
        def total(length):
            fn = compiled_chain(x, length, opts)
            np.asarray(fn(x))          # warm
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                np.asarray(fn(x))
                best = min(best, time.perf_counter() - t0)
            return best
        ts, tl = total(n_short), total(n_long)
        return max((tl - ts) / (n_long - n_short), 1e-9)

    for B in (128, 256):
        x = jax.random.normal(KEY, (B, 224, 224, 3))
        for kib in (None, 32768, 65536, 131072):
            opts = ({} if kib is None
                    else {"xla_tpu_scoped_vmem_limit_kib": str(kib)})
            try:
                t = run(x, opts)
                print(f"B={B} scoped_kib={kib or 'default'}: "
                      f"{t*1e3:7.3f} ms -> {B/t:8.0f} img/s", flush=True)
            except Exception as e:
                print(f"B={B} scoped_kib={kib}: FAIL {str(e)[:160]}",
                      flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
