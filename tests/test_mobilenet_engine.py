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


def test_engine_qivr_bitwise_parity():
    """Engine with chained inverted-residual kernels == per-block engine,
    bitwise (interpret mode), and the chains actually dispatch."""
    m = get_model("mobilenet_v2", num_classes=10, width_mult=1.0)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    from qtpu.serve.experimental import ExperimentalMobileNetV2Int8Engine

    ref = MobileNetV2Int8Engine(sv, num_classes=10)
    eng = ExperimentalMobileNetV2Int8Engine(sv, num_classes=10, use_qivr=True,
                                            qivr_interpret=True)
    # V2_CFG identity runs: block2(24x2->1), block4/5(32x3->2), block7/8/9
    # (64x4->3), block11/12(96x3->2), block14/15(160x3->2)
    assert sum(p["nrun"] for p in eng._qivr_prep.values()) == 10, \
        {k: p["nrun"] for k, p in eng._qivr_prep.items()}
    y_ref = np.asarray(ref.forward(x))
    y_q = np.asarray(eng.forward(x))
    assert np.array_equal(y_ref, y_q)


def test_v1_engine_matches_module_serve():
    """MobileNetV1 flat int8 engine vs the module SERVE path."""
    from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine

    m = get_model("mobilenet_v1", num_classes=10, width_mult=1.0)
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
    eng = MobileNetV1Int8Engine(sv, num_classes=10)
    y_eng = eng.forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                (float(jnp.linalg.norm(y_module)) + 1e-9))
    assert rel < 0.15, f"engine deviates: rel={rel}"
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0
