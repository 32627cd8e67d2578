"""Dual-input fused GEMM vs the engine's separate-conv XLA path.

The kernel must be bit-identical to the sequence it replaces in
``ResNetInt8Engine._bottleneck`` for projection blocks:

    res = gemm_1x1(x2, down, out_dtype=f32)            # fp32 residual
    out = gemm_1x1(x1, conv3, relu=True, requant=grid,
                   residual=res, out_dtype=int8)

including fp32 addition grouping (see qmatmul_dual.py docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.ops.pallas.qmatmul_dual import qmatmul_dual

KEY = jax.random.PRNGKey(7)
INTERPRET = jax.devices()[0].platform != "tpu"


def _operand(key, M, K, N, scale=0.02, zp=3):
    k1, k2, k3, k4 = jax.random.split(key, 4)
    xq = jax.random.randint(k1, (M, K), -127, 128, dtype=jnp.int8)
    wq = jax.random.randint(k2, (K, N), -127, 128, dtype=jnp.int8)
    ws = jax.random.uniform(k3, (N,), jnp.float32, 0.001, 0.01)
    cs = jnp.sum(wq.astype(jnp.int32), axis=0)
    b = jax.random.normal(k4, (N,))
    return dict(x=xq, w=wq, ws=ws, cs=cs, b=b,
                s=jnp.float32(scale), zp=jnp.int32(zp))


def _ref_branch(o):
    acc = qops.qmatmul(o["x"], o["w"])
    return qops.dequant_epilogue(acc, act_scale=o["s"], act_zp=o["zp"],
                                 w_scale=o["ws"], colsum=o["cs"], bias=o["b"])


def _run(o1, o2, requant_zp, relu=True, bm=128, bn=128):
    return qmatmul_dual(
        o1["x"], o1["w"], o2["x"], o2["w"],
        act_scale1=o1["s"], act_zp1=o1["zp"], w_scale1=o1["ws"],
        colsum1=o1["cs"], bias1=o1["b"],
        act_scale2=o2["s"], act_zp2=o2["zp"], w_scale2=o2["ws"],
        colsum2=o2["cs"], bias2=o2["b"],
        requant_scale=jnp.float32(0.04), requant_zp=requant_zp,
        relu=relu, bm=bm, bn=bn, interpret=INTERPRET)


@pytest.mark.parametrize("requant_zp", [None, jnp.int32(-11)])
def test_exact_vs_separate_conv_path(requant_zp):
    M, K1, K2, N = 256, 64, 128, 256
    o1 = _operand(jax.random.fold_in(KEY, 0), M, K1, N, 0.015, 5)
    o2 = _operand(jax.random.fold_in(KEY, 1), M, K2, N, 0.03, -2)
    y = _run(o1, o2, requant_zp)
    # engine XLA path: fp32 residual, then fused add + relu + requant
    ref = _ref_branch(o1) + _ref_branch(o2)
    ref = jnp.maximum(ref, 0.0)
    sym = requant_zp is None
    ref8 = qops.quantize_act(ref, jnp.float32(0.04),
                             jnp.int32(0) if sym else requant_zp,
                             symmetric=sym)
    assert y.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref8))


def test_unequal_k_and_tiling():
    """K1 != K2 with several (bm, bn) tiles, layer4_0-like ratios."""
    M, K1, K2, N = 512, 128, 256, 512
    o1 = _operand(jax.random.fold_in(KEY, 2), M, K1, N)
    o2 = _operand(jax.random.fold_in(KEY, 3), M, K2, N)
    y = _run(o1, o2, jnp.int32(4), bm=256, bn=256)
    ref = _ref_branch(o1) + _ref_branch(o2)
    ref = jnp.maximum(ref, 0.0)
    ref8 = qops.quantize_act(ref, jnp.float32(0.04), jnp.int32(4),
                             symmetric=False)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref8))


def test_shape_mismatch_raises():
    o1 = _operand(jax.random.fold_in(KEY, 4), 128, 64, 128)
    o2 = _operand(jax.random.fold_in(KEY, 5), 256, 64, 128)   # M differs
    with pytest.raises(AssertionError):
        _run(o1, o2, None)
