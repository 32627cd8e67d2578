"""MobileNet depthwise path: quantize → calibrate → freeze → integer serve.

Exercises the depthwise-conv quant path (BASELINE.json config 3's layer type)
through the generic module SERVE route, including grouped int8 convolution
with zero-point padding in qops.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("name", ["mobilenet_v1", "mobilenet_v2"])
def test_mobilenet_int8_serve(name):
    m = get_model(name, num_classes=10, width_mult=0.25)
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
    y_sim = jax.jit(qm.apply)(v, x)
    sm, sv = freeze(qm, v, x)
    # depthwise kernels frozen as int8 with per-channel scales
    dw = sv["qweights"]["block0"]["dw"]
    assert dw["kernel_q"].dtype == jnp.int8
    assert dw["kernel_q"].shape[2] == 1            # HWIO, I = C/groups = 1
    y_srv = jax.jit(sm.apply)(sv, x)
    rel = float(jnp.linalg.norm(y_srv - y_sim) /
                (float(jnp.linalg.norm(y_sim)) + 1e-9))
    assert rel < 0.05, f"{name} serve deviates: rel={rel}"
    assert bool(jnp.all(jnp.isfinite(y_srv)))
