"""Same-process MobileNetV2 e2e A/B: per-block XLA engine vs qivr chains.

Round-2 left MNv2 at 26k img/s = 33% of its per-layer ideal with "kernel
injection is not the lever" recorded for PER-OP injection; the chained
whole-run kernel (qtpu.ops.pallas.qivr) is the untried shape (VERDICT r2
next-#2).  This measures the full engine, same-process, OFF vs qivr, plus
each chain in isolation vs its XLA block sequence.

Usage: python scripts/chip_qivr_bench.py [B]
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
from qtpu.ops.pallas.qivr import qivr_fused
from qtpu.serve.experimental import \
    ExperimentalMobileNetV2Int8Engine as MobileNetV2Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KEY = jax.random.PRNGKey(0)

# run-start block index -> (H at 224 input)
RUN_RES = {2: 56, 4: 28, 7: 14, 11: 14, 14: 7}


def main() -> int:
    model = get_model("mobilenet_v2", num_classes=1000)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)

    ref = MobileNetV2Int8Engine(sv, num_classes=1000)
    eng = MobileNetV2Int8Engine(sv, num_classes=1000, use_qivr=True)
    print("qivr runs:", {k: p["nrun"] for k, p in eng._qivr_prep.items()},
          flush=True)
    y0 = np.asarray(ref.forward(x0))
    y1 = np.asarray(eng.forward(x0))
    print("e2e bit-exact:", np.array_equal(y0, y1),
          "maxdiff:", float(np.max(np.abs(y0 - y1))), flush=True)

    # --- isolated per-run A/B: chain kernel vs its per-block XLA slice ---
    from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

    blocks = eng._blocks()
    for start, prep in sorted(eng._qivr_prep.items()):
        H = RUN_RES[start]
        C = prep["weights"]["w1"].shape[1]
        x = jax.random.randint(jax.random.fold_in(KEY, start),
                               (B, H, H, C), -128, 128, jnp.int8)

        def xla_fn(x_q, start=start, prep=prep):
            for j in range(prep["nrun"]):
                name = blocks[start + j][0]
                nodes = tuple(eng._node(name, k)
                              for k in ("expand", "dw", "project"))
                tgt = (eng._block_in_grid(blocks[start + j + 1][0])[:2]
                       if j + 1 < prep["nrun"] else prep["tgt"][:2])
                a = gemm_1x1(x_q, nodes[0], relu=True, act_max=6.0,
                             requant=grid_of(nodes[1]), out_dtype=jnp.int8,
                             use_pallas=False)
                b = conv_xla(a, nodes[1], strides=(1, 1),
                             groups=a.shape[-1], relu=True, act_max=6.0,
                             requant=grid_of(nodes[2]))
                x_q = gemm_1x1(b, nodes[2], relu=False, requant=tgt,
                               out_dtype=jnp.int8, residual=x_q,
                               res_grid=grid_of(nodes[0]), use_pallas=False)
            return x_q

        def ivr_fn(x_q, prep=prep, H=H, C=C):
            out = qivr_fused(x_q.reshape(-1, C), **prep["weights"],
                             **prep["coeffs"], h=H, w=H)
            return out.reshape(x_q.shape)

        xj = jax.jit(xla_fn)
        ij = jax.jit(ivr_fn)
        exact = np.array_equal(np.asarray(xj(x)), np.asarray(ij(x)))
        tx = time_scan_fit(lambda c, f=xj: f(c), x, n_short=5, n_long=15)
        ti = time_scan_fit(lambda c, f=ij: f(c), x, n_short=5, n_long=15)
        print(f"run@{start:<2d} H={H:<2d} C={C:<4d} nrun={prep['nrun']}: "
              f"XLA {tx*1e6:7.0f}us  qivr {ti*1e6:7.0f}us  "
              f"ratio {tx/ti:4.2f}x  bit-exact={exact}", flush=True)

    # --- e2e A/B, same process, two trials ---
    x = jax.random.normal(KEY, (B, 224, 224, 3))
    for trial in range(2):
        for name, e in (("qivr OFF", ref), ("qivr ON ", eng)):
            def body(c, e=e):
                out = e.forward(c)
                return c + out[0, 0] * 0.0
            t = time_scan_fit(body, x, n_short=6, n_long=20)
            print(f"t{trial} {name}: {t*1e3:7.3f} ms/step -> "
                  f"{B/t:8.0f} img/s @ B={B}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
