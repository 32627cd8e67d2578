"""Tie-flip diagnosis for qivr on REAL frozen MNv2 weights.

chip_qivr_bench saw runs @4/@11 bit-inexact on hw while random-weight sweeps
(parity/parity2) are exact at the same geometry+grid.  Real relu6 grids
(scale exactly 6/255 when calibration saturates) make requant epilogues land
on f32 round() .5 ties, which different fma/fusion orders resolve
differently.  This computes, per run: XLA-jitted vs XLA-EAGER (per-op jit)
vs qivr codes — if jit-vs-eager mismatches too (same sparse +-1 pattern),
the deviation is tie instability across program shapes, not a kernel bug.
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.ops.pallas.qivr import qivr_fused
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of
from qtpu.serve.experimental import \
    ExperimentalMobileNetV2Int8Engine as MobileNetV2Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)
B = 32
RUN_RES = {2: 56, 4: 28, 7: 14, 11: 14, 14: 7}


def main() -> int:
    model = get_model("mobilenet_v2", num_classes=1000)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    eng = MobileNetV2Int8Engine(sv, num_classes=1000, use_qivr=True)
    blocks = eng._blocks()

    for start in (4, 11, 14):
        prep = eng._qivr_prep[start]
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

        y_jit = np.asarray(jax.jit(xla_fn)(x))
        y_eager = np.asarray(xla_fn(x))          # per-op dispatch
        y_ivr = np.asarray(jax.jit(
            lambda xq, p=prep, H=H, C=C: qivr_fused(
                xq.reshape(-1, C), **p["weights"], **p["coeffs"],
                h=H, w=H).reshape(xq.shape))(x))

        def rep(a, b, label):
            d = a.astype(np.int32) - b.astype(np.int32)
            n = int(np.sum(d != 0))
            print(f"  {label}: mismatches={n}/{d.size} "
                  f"maxabs={int(np.max(np.abs(d)))}", flush=True)
            return d != 0

        print(f"run@{start} H={H} C={C} nrun={prep['nrun']}:", flush=True)
        m1 = rep(y_jit, y_eager, "XLA-jit vs XLA-eager")
        m2 = rep(y_jit, y_ivr, "XLA-jit vs qivr     ")
        if m1.any() or m2.any():
            both = int(np.sum(m1 & m2))
            print(f"  overlap of mismatch positions: {both}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
