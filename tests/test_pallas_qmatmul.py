"""Pallas fused int8 matmul vs the XLA oracle (interpret mode on CPU).

On TPU the same assertions run compiled (SURVEY.md §4.2 "Pallas kernels vs
pure-JAX reference ... exact int match on the quantized accumulator"); the
real-chip perf run lives in the bench harness, not the test suite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.ops.pallas.qmatmul import qmatmul_fused

KEY = jax.random.PRNGKey(0)
INTERPRET = jax.devices()[0].platform != "tpu"


def _setup(M=256, K=512, N=256):
    xq = jax.random.randint(KEY, (M, K), -127, 128, dtype=jnp.int8)
    wq = jax.random.randint(jax.random.fold_in(KEY, 1), (K, N), -127, 128,
                            dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (N,), jnp.float32,
                            0.001, 0.01)
    cs = jnp.sum(wq.astype(jnp.int32), axis=0)
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (N,))
    return xq, wq, ws, cs, b



def _folded_ref(xq, wq, residual=None, out_dtype=jnp.float32, **kw):
    """Oracle = the folded epilogue (qops.epilogue_coeffs) applied to the
    XLA int32 accumulator — the same single-source formula the kernel and
    qtpu.serve.fused_ops use (jitted: whole-program fp32 contraction
    choices match compiled code)."""
    @jax.jit
    def f(xq, wq, residual):
        acc = qops.qmatmul(xq, wq)
        co, mode = qops.epilogue_coeffs(**kw)
        return qops.apply_epilogue(acc, co, mode, residual=residual,
                                   out_dtype=out_dtype)
    return f(xq, wq, residual)

@pytest.mark.parametrize("zp", [0, 5, -7])
def test_exact_vs_oracle(zp):
    xq, wq, ws, cs, b = _setup()
    y = qmatmul_fused(xq, wq, act_scale=jnp.float32(0.02),
                      act_zp=jnp.int32(zp), w_scale=ws, colsum=cs, bias=b,
                      bm=128, bn=128, bk=256, interpret=INTERPRET)
    ref = _folded_ref(xq, wq, act_scale=jnp.float32(0.02),
                      act_zp=jnp.int32(zp), w_scale=ws, colsum=cs, bias=b)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_requant_path_exact():
    xq, wq, ws, cs, b = _setup()
    y8 = qmatmul_fused(xq, wq, act_scale=jnp.float32(0.02),
                       act_zp=jnp.int32(5), w_scale=ws, colsum=cs, bias=b,
                       requant_scale=jnp.float32(0.05), out_dtype=jnp.int8,
                       bm=128, bn=128, bk=256, interpret=INTERPRET)
    ref8 = _folded_ref(xq, wq, out_dtype=jnp.int8,
                       act_scale=jnp.float32(0.02), act_zp=jnp.int32(5),
                       w_scale=ws, colsum=cs, bias=b,
                       requant_scale=jnp.float32(0.05))
    assert y8.dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(y8), np.asarray(ref8))


def test_multi_k_step_accumulation():
    """K split over several grid steps must accumulate exactly."""
    xq, wq, ws, cs, b = _setup(M=128, K=1024, N=128)
    y = qmatmul_fused(xq, wq, act_scale=jnp.float32(0.01),
                      act_zp=jnp.int32(3), w_scale=ws, colsum=cs, bias=b,
                      bm=128, bn=128, bk=256, interpret=INTERPRET)
    ref = _folded_ref(xq, wq, act_scale=jnp.float32(0.01),
                      act_zp=jnp.int32(3), w_scale=ws, colsum=cs, bias=b)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))


def test_misaligned_shape_raises():
    # K=500 does not tile by bk=256 (and is not clamped since 500 > 256)
    xq, wq, ws, cs, b = _setup(M=128, K=500, N=256)
    with pytest.raises(AssertionError):
        qmatmul_fused(xq, wq, act_scale=jnp.float32(0.02),
                      act_zp=jnp.int32(0), w_scale=ws, colsum=cs,
                      bm=128, bn=128, bk=256, interpret=INTERPRET)


def test_packed_int4_inkernel_unpack_exact():
    """w_packed=True (in-VMEM nibble unpack) matches unpack-outside exactly."""
    from qtpu.ops.pallas.qmatmul import pack_int4_halves
    M, K, N, bn = 128, 256, 512, 256
    xq = jax.random.randint(KEY, (M, K), -127, 128, dtype=jnp.int8)
    w4 = jax.random.randint(jax.random.fold_in(KEY, 9), (K, N), -7, 8,
                            dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (N,), jnp.float32,
                            0.001, 0.01)
    cs = jnp.sum(w4.astype(jnp.int32), axis=0)
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (N,))
    kw = dict(act_scale=jnp.float32(0.02), act_zp=jnp.int32(5), w_scale=ws,
              colsum=cs, bias=b, requant_scale=jnp.float32(0.05),
              requant_zp=jnp.int32(-3), relu=True, out_dtype=jnp.int8,
              bm=128, bn=bn, bk=128, interpret=INTERPRET)
    ref = qmatmul_fused(xq, w4, **kw)
    got = qmatmul_fused(xq, pack_int4_halves(w4, bn), w_packed=True, **kw)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_pack_int4_halves_roundtrip():
    from qtpu.ops.pallas.qmatmul import pack_int4_halves
    w4 = jax.random.randint(KEY, (64, 512), -7, 8, dtype=jnp.int8)
    p = pack_int4_halves(w4, bn=256)
    assert p.shape == (64, 256)
    lo = ((np.asarray(p).astype(np.int32) << 28) >> 28)
    hi = (np.asarray(p).astype(np.int32) >> 4)
    t = np.asarray(w4).reshape(64, 2, 2, 128)
    np.testing.assert_array_equal(lo.reshape(64, 2, 128), t[:, :, 0, :])
    np.testing.assert_array_equal(hi.reshape(64, 2, 128), t[:, :, 1, :])
