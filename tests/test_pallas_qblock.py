"""Fused bottleneck kernel (qblock) vs the engine's 3-op XLA sequence.

The fused kernel must be BIT-IDENTICAL to the sequence it replaces
(gemm_1x1 -> conv_xla -> gemm_1x1+residual, all on int8 codes with affine
requantization between), because the engine dispatches per-block and mixing
paths must not change results. Interpret mode on CPU; the same kernel is
benchmarked on the real chip by qtpu/bench scripts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops.pallas.qblock import block_coeffs, qbottleneck_fused
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

KEY = jax.random.PRNGKey(7)


def _node(key, kh, kw, ci, co, *, zp, scale):
    """Random frozen-conv node in the freeze() layout."""
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (kh, kw, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(scale),
        "act_zp": jnp.int32(zp),
    }


def _row(v):
    return jnp.asarray(v).reshape(1, -1)


@pytest.mark.parametrize("B,H,cin,cmid,pair", [
    (2, 8, 128, 64, 1),     # layer1 shape, plain rows
    (2, 8, 128, 64, 2),     # layer1 shape, paired rows (the on-chip form)
    (4, 4, 256, 128, 1),    # layer2 shape
])
def test_qblock_bit_identical_to_sequence(B, H, cin, cmid, pair):
    W = H
    ks = jax.random.split(KEY, 8)
    c1 = _node(ks[0], 1, 1, cin, cmid, zp=5, scale=0.021)
    c2 = _node(ks[1], 3, 3, cmid, cmid, zp=-17, scale=0.013)
    c3 = _node(ks[2], 1, 1, cmid, cin, zp=9, scale=0.017)
    next_grid = (jnp.float32(0.019), jnp.int32(-3))
    x_q = jax.random.randint(ks[3], (B, H, W, cin), -128, 128, jnp.int8)

    # --- reference: the exact 3-op sequence the engine runs today ---
    a = gemm_1x1(x_q, c1, relu=True, requant=grid_of(c2),
                 out_dtype=jnp.int8, use_pallas=False)
    b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
    ref = gemm_1x1(b, c3, relu=True, requant=next_grid, out_dtype=jnp.int8,
                   residual=x_q, res_grid=grid_of(c1), use_pallas=False)

    # --- fused kernel (interpret mode on CPU) ---
    out = qbottleneck_fused(
        x_q,
        w1=c1["kernel_q"].reshape(cin, cmid),
        w2=c2["kernel_q"].reshape(9, cmid, cmid),
        w3=c3["kernel_q"].reshape(cmid, cin),
        **block_coeffs(c1, c2, c3, next_grid),
        bb=1, pair=pair, interpret=True)

    assert out.shape == ref.shape == x_q.shape
    ref_np, out_np = np.asarray(ref), np.asarray(out)
    mismatch = np.sum(ref_np != out_np)
    assert mismatch == 0, f"{mismatch}/{ref_np.size} codes differ"


def test_qblock_bb_tiling():
    """bb > 1 must give the same result as bb = 1."""
    B, H, cin, cmid = 4, 4, 128, 64
    ks = jax.random.split(jax.random.fold_in(KEY, 1), 4)
    c1 = _node(ks[0], 1, 1, cin, cmid, zp=0, scale=0.02)
    c2 = _node(ks[1], 3, 3, cmid, cmid, zp=2, scale=0.01)
    c3 = _node(ks[2], 1, 1, cmid, cin, zp=-1, scale=0.015)
    next_grid = (jnp.float32(0.02), jnp.int32(0))
    x_q = jax.random.randint(ks[3], (B, H, H, cin), -128, 128, jnp.int8)
    kwargs = dict(
        w1=c1["kernel_q"].reshape(cin, cmid),
        w2=c2["kernel_q"].reshape(9, cmid, cmid),
        w3=c3["kernel_q"].reshape(cmid, cin),
        **block_coeffs(c1, c2, c3, next_grid),
        interpret=True)
    o1 = qbottleneck_fused(x_q, bb=1, **kwargs)
    o4 = qbottleneck_fused(x_q, bb=4, **kwargs)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o4))


def test_engine_qblock_parity():
    """Engine with fused bottleneck kernel == engine without, bit-exact.

    stage_sizes=(2,1,1,1) gives one identity bottleneck (layer1_1:
    Cin=256, Cmid=64 -> pair=2 on chip) that dispatches to qblock.
    """
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.serve.experimental import \
        ExperimentalResNetInt8Engine as ResNetInt8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(2, 1, 1, 1))
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)

    arch = dict(stage_sizes=(2, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    eng_ref = ResNetInt8Engine(sv, arch, use_pallas=False, use_qblock=False)
    eng_fused = ResNetInt8Engine(sv, arch, use_pallas=False, use_qblock=True,
                                 qblock_interpret=True)
    assert "layer1_1" in eng_fused._qblock_prep, "qblock did not prepare"
    y_ref = eng_ref.forward(x)
    y_fused = eng_fused.forward(x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_fused))
