"""Independent-oracle cross-check vs Google AQT (SURVEY.md §4.2).

``aqtp`` ships in this environment as the one other int8 simulated-quant
implementation available offline.  These tests do NOT build on AQT (the
north star requires an own op library); they use its ``dot_general`` as an
independent oracle: two unrelated implementations of int8 symmetric
fake-quant matmul on the same data must land in the same accuracy class.
A scale convention or rounding bug in qtpu (e.g. a 2x-off scale, wrong clip
range, missing round) would separate the two by far more than the mutual
quantization noise and fail these bounds.

AQT's default int8 numerics differ from qtpu's in one deliberate way
(absmax -> 127.5 - eps vs the reference's absmax -> 127 grid — SURVEY §2.1
pins qtpu to max|w|/(2^(b-1)-1)), so the assertion is statistical closeness
against the shared f32 ground truth, not bit equality.
"""
import numpy as np
import pytest

import jax.numpy as jnp

aqt_config = pytest.importorskip("aqt.jax.v2.config")

from qtpu.ops import fakequant as fq

DIMS = (((1,), (0,)), ((), ()))          # plain (M,K)x(K,N) matmul


def _rel(a, b):
    return float(np.linalg.norm(np.asarray(a) - np.asarray(b))
                 / max(np.linalg.norm(np.asarray(b)), 1e-12))


def _qtpu_int8_matmul(a, b):
    """qtpu semantics: per-tensor symmetric absmax int8 on both operands."""
    aq = fq.fake_quant_weight(a, bits=8)
    bq = fq.fake_quant_weight(b, bits=8)
    return jnp.dot(aq, bq)


@pytest.mark.parametrize("seed,shape", [(0, (64, 128, 96)),
                                        (1, (32, 256, 48))])
def test_int8_matmul_matches_aqt_accuracy_class(seed, shape):
    m, k, n = shape
    rng = np.random.default_rng(seed)
    a = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32))
    exact = jnp.dot(a, b)

    dg = aqt_config.dot_general_make(lhs_bits=8, rhs_bits=8)
    y_aqt = dg(a, b, DIMS, precision=None)
    y_qtpu = _qtpu_int8_matmul(a, b)

    e_aqt = _rel(y_aqt, exact)
    e_qtpu = _rel(y_qtpu, exact)
    # both are real quantizers (nonzero error) of the same class
    assert 1e-4 < e_aqt < 0.05
    assert 1e-4 < e_qtpu < 0.05
    # and within 2x of each other's error against the f32 ground truth
    assert 0.5 < e_qtpu / e_aqt < 2.0
    # the two quantized results agree with each other to mutual-noise level
    assert _rel(y_qtpu, y_aqt) < e_aqt + e_qtpu


def test_int4_weight_matmul_matches_aqt_accuracy_class():
    """INT4 weights x INT8 activations (config-5 arithmetic) vs AQT 4/8."""
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.normal(size=(64, 128)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(128, 96)).astype(np.float32))
    exact = jnp.dot(a, w)

    dg = aqt_config.dot_general_make(lhs_bits=8, rhs_bits=4)
    y_aqt = dg(a, w, DIMS, precision=None)
    y_qtpu = jnp.dot(fq.fake_quant_weight(a, bits=8),
                     fq.fake_quant_weight(w, bits=4))

    e_aqt = _rel(y_aqt, exact)
    e_qtpu = _rel(y_qtpu, exact)
    assert 1e-3 < e_aqt < 0.25
    assert 1e-3 < e_qtpu < 0.25
    assert 0.5 < e_qtpu / e_aqt < 2.0
