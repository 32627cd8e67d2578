"""im2col-GEMM conv vs the XLA oracle (exactness incl. K-padding)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.ops.pallas.qim2col import qconv2d_im2col

KEY = jax.random.PRNGKey(0)
INTERPRET = jax.devices()[0].platform != "tpu"


@pytest.mark.parametrize("strides,k,ci", [((2, 2), 7, 3), ((1, 1), 3, 16),
                                          ((2, 2), 3, 32)])
def test_exact_vs_oracle(strides, k, ci):
    B, H, Co = 2, 16, 32
    xq = jax.random.randint(KEY, (B, H, H, ci), -127, 128, dtype=jnp.int8)
    wq = jax.random.randint(jax.random.fold_in(KEY, 1), (k, k, ci, Co),
                            -127, 128, dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (Co,), jnp.float32,
                            0.001, 0.01)
    cs = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (Co,))
    zp = jnp.int32(6)
    y = qconv2d_im2col(xq, wq, strides=strides, act_scale=jnp.float32(0.02),
                       act_zp=zp, w_scale=ws, colsum=cs, bias=b,
                       interpret=INTERPRET)
    # folded oracle (qim2col delegates to qmatmul_fused, whose epilogue is
    # the folded qops.epilogue_coeffs formula since round 2)
    @jax.jit
    def ref_fn(xq, wq):
        acc = qops.qconv2d(xq, wq, strides=strides, zp=zp)
        co, mode = qops.epilogue_coeffs(
            act_scale=jnp.float32(0.02), act_zp=zp, w_scale=ws, colsum=cs,
            bias=b)
        return qops.apply_epilogue(acc, co, mode)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref_fn(xq, wq)))
