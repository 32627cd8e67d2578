"""Pallas depthwise int8 kernel vs the folded XLA oracle (CPU interpret)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.ops.pallas.qconv import pad_for_conv
from qtpu.ops.pallas.qdepthwise import qdepthwise_fused

KEY = jax.random.PRNGKey(0)
INTERPRET = jax.devices()[0].platform != "tpu"


def _setup(B=2, H=8, C=128):
    xq = jax.random.randint(KEY, (B, H, H, C), -127, 128, dtype=jnp.int8)
    wq = jax.random.randint(jax.random.fold_in(KEY, 1), (3, 3, 1, C),
                            -127, 128, dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (C,), jnp.float32,
                            0.001, 0.01)
    cs = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (C,))
    return xq, wq, ws, cs, b


@pytest.mark.parametrize("zp", [0, 4])
def test_exact_vs_oracle(zp):
    xq, wq, ws, cs, b = _setup()
    zp = jnp.int32(zp)
    xp = pad_for_conv(xq, (3, 3), zp)
    y = qdepthwise_fused(xp, wq, act_scale=jnp.float32(0.02), act_zp=zp,
                         w_scale=ws, colsum=cs, bias=b, bb=1,
                         interpret=INTERPRET)
    @jax.jit
    def ref_fn(xq, wq):
        acc = qops.qconv2d(xq, wq, groups=xq.shape[-1], zp=zp)
        co, mode = qops.epilogue_coeffs(
            act_scale=jnp.float32(0.02), act_zp=zp, w_scale=ws, colsum=cs,
            bias=b)
        return qops.apply_epilogue(acc, co, mode)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref_fn(xq, wq)))


def test_relu_affine_requant():
    xq, wq, ws, cs, b = _setup(C=64)
    zp = jnp.int32(3)
    xp = pad_for_conv(xq, (3, 3), zp)
    y8 = qdepthwise_fused(xp, wq, act_scale=jnp.float32(0.02), act_zp=zp,
                          w_scale=ws, colsum=cs, bias=b,
                          requant_scale=jnp.float32(0.05),
                          requant_zp=jnp.int32(-3), relu=True,
                          out_dtype=jnp.int8, bb=2, interpret=INTERPRET)
    @jax.jit
    def ref_fn(xq, wq):
        acc = qops.qconv2d(xq, wq, groups=xq.shape[-1], zp=zp)
        co, mode = qops.epilogue_coeffs(
            act_scale=jnp.float32(0.02), act_zp=zp, w_scale=ws, colsum=cs,
            bias=b, requant_scale=jnp.float32(0.05),
            requant_zp=jnp.int32(-3), relu=True)
        return qops.apply_epilogue(acc, co, mode, out_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(ref_fn(xq, wq)))
