"""MobileNetV2 flat int8 engine vs the module SERVE path (CPU, XLA ops)."""
import jax
import jax.numpy as jnp
import numpy as np

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def test_engine_matches_module_serve():
    # width_mult=1.0: at tiny widths the per-layer quantization noise of the
    # 17-block requant chain compounds (measured rel 0.23 at 0.25x vs 0.065
    # at 1.0x with identical argmax) — test at the realistic width.
    m = get_model("mobilenet_v2", num_classes=10, width_mult=1.0)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    tr = jax.jit(lambda v, xx: qm.apply(
        v, xx, train=True, mutable=["batch_stats", "quant_stats"]))
    for i in range(2):
        _, mut = tr(v, jax.random.normal(jax.random.fold_in(KEY, i),
                                         (2, 64, 64, 3)))
        v.update(mut)
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    y_module = jax.jit(sm.apply)(sv, x)
    eng = MobileNetV2Int8Engine(sv, num_classes=10, use_pallas=False)
    y_eng = eng.forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                (float(jnp.linalg.norm(y_module)) + 1e-9))
    assert rel < 0.15, f"engine deviates: rel={rel}"
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0
