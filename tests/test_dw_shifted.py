"""qdepthwise_shifted: bit-exactness vs the grouped-conv op.

The shifted-elementwise form must produce the IDENTICAL int32 accumulator
as ``qconv2d(..., groups=C)`` for every stride/padding/zero-point case the
MobileNet engines use, and the engine-level dw_shifted flag must be a
no-op numerically.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("stride", [1, 2])
@pytest.mark.parametrize("zp", [0, 3, -5])
@pytest.mark.parametrize("hw,c", [(12, 32), (11, 24), (7, 8)])
def test_shifted_matches_grouped_conv(stride, zp, hw, c):
    k1, k2 = jax.random.split(KEY)
    x = jax.random.randint(k1, (2, hw, hw, c), -127, 128, jnp.int8)
    w = jax.random.randint(k2, (3, 3, 1, c), -127, 128, jnp.int8)
    zpa = jnp.int32(zp)
    ref = qops.qconv2d(x, w, strides=(stride, stride), padding="SAME",
                       groups=c, zp=zpa)
    got = qops.qdepthwise_shifted(x, w, strides=(stride, stride),
                                  padding="SAME", zp=zpa)
    assert got.dtype == ref.dtype == jnp.int32
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_engine_dw_shifted_is_numerically_identical():
    """MobileNetV2 engine with dw_shifted=True emits identical logits."""
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("mobilenet_v2", num_classes=10)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = jax.jit(qm.init, static_argnames="train")(KEY, x, train=True)
    v = calibrate(qm, dict(v), [x])
    _, sv = freeze(qm, v, x)
    y_ref = MobileNetV2Int8Engine(sv, num_classes=10).forward(x)
    y_sh = MobileNetV2Int8Engine(sv, num_classes=10,
                                 dw_shifted=True).forward(x)
    np.testing.assert_array_equal(np.asarray(y_sh), np.asarray(y_ref))
    # "s2" = shifted on strided depthwise convs only (round-4 per-shape
    # roofline dispatch) — must also be a numeric no-op
    y_s2 = MobileNetV2Int8Engine(sv, num_classes=10,
                                 dw_shifted="s2").forward(x)
    np.testing.assert_array_equal(np.asarray(y_s2), np.asarray(y_ref))


def test_v1_engine_dw_shifted_is_numerically_identical():
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("mobilenet_v1", num_classes=10)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = jax.jit(qm.init, static_argnames="train")(KEY, x, train=True)
    v = calibrate(qm, dict(v), [x])
    _, sv = freeze(qm, v, x)
    y_ref = MobileNetV1Int8Engine(sv, num_classes=10).forward(x)
    y_sh = MobileNetV1Int8Engine(sv, num_classes=10,
                                 dw_shifted=True).forward(x)
    np.testing.assert_array_equal(np.asarray(y_sh), np.asarray(y_ref))
    y_s2 = MobileNetV1Int8Engine(sv, num_classes=10,
                                 dw_shifted="s2").forward(x)
    np.testing.assert_array_equal(np.asarray(y_s2), np.asarray(y_ref))
