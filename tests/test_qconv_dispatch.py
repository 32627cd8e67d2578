"""Phase-split strided Pallas conv vs the XLA strided oracle (bit-exact).

VERDICT r1 item 2: ``qconv_dispatch.qconv2d_strided`` — promised by
qconv.py's docstring — must exist, decompose stride-2 convs into four
stride-1 phase kernels, and match ``qops.qconv2d`` + folded epilogue
exactly.  Interpret mode on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.ops.pallas.qconv_dispatch import qconv2d_strided

KEY = jax.random.PRNGKey(21)


def _setup(B, H, KH, Ci, Co):
    xq = jax.random.randint(KEY, (B, H, H, Ci), -128, 128, dtype=jnp.int8)
    wq = jax.random.randint(jax.random.fold_in(KEY, 1), (KH, KH, Ci, Co),
                            -127, 128, dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (Co,), jnp.float32,
                            0.002, 0.02)
    cs = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (Co,)) * 0.1
    return xq, wq, ws, cs, b


@pytest.mark.parametrize("KH,Ci,Co,H", [
    (3, 32, 64, 12),       # projection-conv2 shape class
    (7, 8, 16, 16),        # stem shape class (odd kernel, interpret only)
])
def test_strided_matches_xla_oracle(KH, Ci, Co, H):
    xq, wq, ws, cs, b = _setup(2, H, KH, Ci, Co)
    zp = jnp.int32(-6)
    kw = dict(act_scale=jnp.float32(0.02), act_zp=zp, w_scale=ws, colsum=cs,
              bias=b)
    y = qconv2d_strided(xq, wq, strides=(2, 2), padding="SAME", bb=2,
                        interpret=True, **kw)

    @jax.jit
    def oracle(xq, wq):
        acc = qops.qconv2d(xq, wq, strides=(2, 2), padding="SAME", zp=zp)
        co, mode = qops.epilogue_coeffs(**kw)
        return qops.apply_epilogue(acc, co, mode)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(oracle(xq, wq)))


def test_strided_requant_relu_exact():
    xq, wq, ws, cs, b = _setup(2, 10, 3, 16, 32)
    zp = jnp.int32(4)
    kw = dict(act_scale=jnp.float32(0.015), act_zp=zp, w_scale=ws, colsum=cs,
              bias=b, requant_scale=jnp.float32(0.05),
              requant_zp=jnp.int32(-2), relu=True)
    y = qconv2d_strided(xq, wq, strides=(2, 2), padding="SAME", bb=2,
                        interpret=True, **kw)
    assert y.dtype == jnp.int8

    @jax.jit
    def oracle(xq, wq):
        acc = qops.qconv2d(xq, wq, strides=(2, 2), padding="SAME", zp=zp)
        co, mode = qops.epilogue_coeffs(**kw)
        return qops.apply_epilogue(acc, co, mode, out_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(oracle(xq, wq)))
