"""Pallas fused int8 conv vs the folded XLA oracle (interpret mode on CPU).

Oracles use qops.epilogue_coeffs/apply_epilogue — the single-source folded
formula shared by the kernel and the serving fused ops — jitted as one
program so fp32 FMA-contraction choices match compiled code.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.ops.pallas.qconv import pad_for_conv, qconv2d_fused

KEY = jax.random.PRNGKey(0)
INTERPRET = jax.devices()[0].platform != "tpu"


def _setup(B=2, H=8, Ci=128, Co=128, k=3):
    xq = jax.random.randint(KEY, (B, H, H, Ci), -127, 128, dtype=jnp.int8)
    wq = jax.random.randint(jax.random.fold_in(KEY, 1), (k, k, Ci, Co),
                            -127, 128, dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (Co,), jnp.float32,
                            0.001, 0.01)
    cs = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (Co,))
    return xq, wq, ws, cs, b


def _folded_ref(xq, wq, zp, out_dtype=jnp.float32, **kw):
    @jax.jit
    def f(xq, wq):
        acc = qops.qconv2d(xq, wq, zp=zp)
        co, mode = qops.epilogue_coeffs(act_zp=zp, **kw)
        return qops.apply_epilogue(acc, co, mode, out_dtype=out_dtype)
    return f(xq, wq)


@pytest.mark.parametrize("zp", [0, 5])
def test_exact_vs_oracle(zp):
    xq, wq, ws, cs, b = _setup()
    zp = jnp.int32(zp)
    xp = pad_for_conv(xq, (3, 3), zp)
    y = qconv2d_fused(xp, wq, act_scale=jnp.float32(0.02), act_zp=zp,
                      w_scale=ws, colsum=cs, bias=b, bb=1,
                      interpret=INTERPRET)
    ref = _folded_ref(xq, wq, zp, act_scale=jnp.float32(0.02),
                      w_scale=ws, colsum=cs, bias=b)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_relu_requant_affine():
    xq, wq, ws, cs, b = _setup()
    zp = jnp.int32(3)
    xp = pad_for_conv(xq, (3, 3), zp)
    rs, rz = jnp.float32(0.04), jnp.int32(-6)
    y8 = qconv2d_fused(xp, wq, act_scale=jnp.float32(0.02), act_zp=zp,
                       w_scale=ws, colsum=cs, bias=b, requant_scale=rs,
                       requant_zp=rz, relu=True, out_dtype=jnp.int8, bb=1,
                       interpret=INTERPRET)
    ref8 = _folded_ref(xq, wq, zp, out_dtype=jnp.int8,
                       act_scale=jnp.float32(0.02), w_scale=ws, colsum=cs,
                       bias=b, requant_scale=rs, requant_zp=rz, relu=True)
    assert y8.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(ref8))


def test_symmetric_requant_matches_oracle():
    xq, wq, ws, cs, b = _setup(Ci=64, Co=64)
    zp = jnp.int32(0)
    xp = pad_for_conv(xq, (3, 3), zp)
    rs = jnp.float32(0.05)
    y8 = qconv2d_fused(xp, wq, act_scale=jnp.float32(0.02), act_zp=zp,
                       w_scale=ws, colsum=cs, bias=b, requant_scale=rs,
                       out_dtype=jnp.int8, bb=1, interpret=INTERPRET)
    ref8 = _folded_ref(xq, wq, zp, out_dtype=jnp.int8,
                       act_scale=jnp.float32(0.02), w_scale=ws, colsum=cs,
                       bias=b, requant_scale=rs)
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(ref8))


def test_5x5_kernel():
    xq, wq, ws, cs, b = _setup(H=10, Ci=32, Co=32, k=5)
    zp = jnp.int32(2)
    xp = pad_for_conv(xq, (5, 5), zp)
    y = qconv2d_fused(xp, wq, act_scale=jnp.float32(0.01), act_zp=zp,
                      w_scale=ws, colsum=cs, bias=b, bb=2,
                      interpret=INTERPRET)
    ref = _folded_ref(xq, wq, zp, act_scale=jnp.float32(0.01),
                      w_scale=ws, colsum=cs, bias=b)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_pad_for_conv_even_kernel_matches_same():
    """Even kernels pad asymmetrically under XLA SAME (lo=total//2,
    hi=total-lo); symmetric k//2 padding silently shifted the output by
    one pixel vs the qops oracle."""
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-100, 100, (2, 9, 9, 4)), jnp.int8)
    zp = jnp.asarray(3, jnp.int32)
    for k in ((4, 4), (2, 2), (3, 3), (5, 5)):
        padded = pad_for_conv(xq, k, zp)
        oracle = qops.resolve_and_pad(xq, k, (1, 1), "SAME", zp)
        assert padded.shape == oracle.shape, (k, padded.shape, oracle.shape)
        np.testing.assert_array_equal(np.asarray(padded), np.asarray(oracle))
