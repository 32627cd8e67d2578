"""DP scaling harness on the 8-virtual-device CPU mesh (structural check).

Absolute CPU times are meaningless; the assertions are that the sharded
program runs at every dp and per-device batch stays constant (weak-scaling
setup matches the real-pod harness exactly — SURVEY.md §6 scaling metric).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.bench.scaling import dp_scaling
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def test_dp_scaling_runs_on_virtual_mesh():
    m = get_model("lenet5")
    x = jax.random.normal(KEY, (8, 28, 28, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    qv = calibrate(qm, dict(jax.jit(qm.init)(KEY, x)), [x])
    sm, sv = freeze(qm, qv, x)
    fwd = jax.jit(lambda xx: sm.apply(sv, xx))
    out = dp_scaling(fwd, (28, 28, 1), dps=(1, 2, 8), batch_per_device=4,
                     n_short=3, n_long=6)
    assert set(out["images_per_sec"]) == {1, 2, 8}
    assert all(v > 0 for v in out["images_per_sec"].values())


def test_engine_int8_ingest_matches_f32_path():
    """forward_codes(quantized images) ≡ forward(f32 images)."""
    from qtpu.data.native import preprocess_quantize

    m = get_model("resnet18", num_classes=10, cifar_stem=True)
    x8 = np.random.default_rng(0).integers(0, 256, (4, 32, 32, 3),
                                           dtype=np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    xf = jnp.asarray(x8, jnp.float32) / 255.0
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, xf, train=True))
    v = calibrate(qm, v, [xf])
    sm, sv = freeze(qm, v, xf)
    eng = ResNetInt8Engine(sv, dict(stage_sizes=(2, 2, 2, 2), width=64,
                                    bottleneck=False, cifar_stem=True,
                                    num_classes=10), use_pallas=False)
    scale, zp = eng.stem_grid()[:2]
    codes = preprocess_quantize(x8, mean, std, float(scale), int(zp))
    y_codes = eng.forward_codes(jnp.asarray(codes))
    y_f32 = eng.forward(xf)
    np.testing.assert_allclose(np.asarray(y_codes), np.asarray(y_f32),
                               atol=1e-4)
