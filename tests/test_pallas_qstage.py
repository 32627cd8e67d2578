"""Chained identity-bottleneck kernel (qstage) vs the engine's XLA sequence.

The whole-stage kernel must be BIT-IDENTICAL to the per-block 3-op sequence
it replaces (gemm_1x1 -> conv_xla -> gemm_1x1+residual, chained with each
block requantizing onto the next block's conv1 grid), because the engine
dispatches whole identity runs through it. Interpret mode on CPU; the same
kernel is benchmarked on the real chip by scripts/chip_qstage_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops.pallas.qstage import qstage_fused, stage_coeffs
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

KEY = jax.random.PRNGKey(11)


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


def _chain(key, nblk, cin, cmid):
    blocks = []
    for i in range(nblk):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        c1 = _node(ks[0], 1, 1, cin, cmid, zp=5 - i, scale=0.021 + 0.002 * i)
        c2 = _node(ks[1], 3, 3, cmid, cmid, zp=-17 + i, scale=0.013)
        c3 = _node(ks[2], 1, 1, cmid, cin, zp=9, scale=0.017 - 0.001 * i)
        blocks.append((c1, c2, c3))
    return blocks


def _ref_chain(x_q, blocks, next_grid):
    """The exact per-block XLA sequence the engine runs today."""
    for i, (c1, c2, c3) in enumerate(blocks):
        tgt = (grid_of(blocks[i + 1][0])[:2] if i + 1 < len(blocks)
               else next_grid)
        a = gemm_1x1(x_q, c1, relu=True, requant=grid_of(c2),
                     out_dtype=jnp.int8, use_pallas=False)
        b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
        x_q = gemm_1x1(b, c3, relu=True, requant=tgt, out_dtype=jnp.int8,
                       residual=x_q, res_grid=grid_of(c1), use_pallas=False)
    return x_q


def _stacked(blocks):
    cin = blocks[0][0]["kernel_q"].shape[-2]
    cmid = blocks[0][0]["kernel_q"].shape[-1]
    return dict(
        w1=jnp.stack([c1["kernel_q"].reshape(cin, cmid)
                      for c1, _, _ in blocks]),
        w2=jnp.concatenate([c2["kernel_q"].reshape(9, cmid, cmid)
                            for _, c2, _ in blocks]),
        w3=jnp.stack([c3["kernel_q"].reshape(cmid, cin)
                      for _, _, c3 in blocks]),
    )


@pytest.mark.parametrize("B,H,cin,cmid,nblk", [
    (2, 7, 256, 64, 2),     # layer1-ish geometry, 2-block chain
    (2, 8, 256, 128, 3),    # layer2-ish geometry, 3-block chain
    (4, 4, 128, 128, 1),    # single block (degenerate chain)
])
def test_qstage_bit_identical_to_sequence(B, H, cin, cmid, nblk):
    W = H
    blocks = _chain(KEY, nblk, cin, cmid)
    next_grid = (jnp.float32(0.019), jnp.int32(-3))
    x_q = jax.random.randint(jax.random.fold_in(KEY, 99),
                             (B, H, W, cin), -128, 128, jnp.int8)

    ref = _ref_chain(x_q, blocks, next_grid)
    out = qstage_fused(
        x_q.reshape(B * H * W, cin), **_stacked(blocks),
        **stage_coeffs(blocks, next_grid), h=H, w=W, k=1, interpret=True)

    ref_np = np.asarray(ref).reshape(B * H * W, cin)
    out_np = np.asarray(out)
    mismatch = np.sum(ref_np != out_np)
    assert mismatch == 0, f"{mismatch}/{ref_np.size} codes differ"


def test_engine_qstage_bitwise_parity():
    """Engine with whole-stage kernels == per-block XLA engine, bitwise."""
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.serve.experimental import \
        ExperimentalResNetInt8Engine as ResNetInt8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(2, 2, 2, 2))   # 1 identity block per stage
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(2, 2, 2, 2), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    ref = ResNetInt8Engine(sv, arch)
    eng = ResNetInt8Engine(sv, arch, use_qstage=True, qstage_interpret=True)
    assert len(eng._qstage_prep) == 4, eng._qstage_prep.keys()
    y_ref = np.asarray(ref.forward(x))
    y_q = np.asarray(eng.forward(x))
    assert np.array_equal(y_ref, y_q)


def test_qstage_k_tiling():
    """k > 1 (several images per grid step) must match k = 1."""
    B, H, cin, cmid = 4, 5, 128, 128
    blocks = _chain(jax.random.fold_in(KEY, 1), 2, cin, cmid)
    next_grid = (jnp.float32(0.02), jnp.int32(0))
    x_q = jax.random.randint(jax.random.fold_in(KEY, 7),
                             (B * H * H, cin), -128, 128, jnp.int8)
    kwargs = dict(**_stacked(blocks), **stage_coeffs(blocks, next_grid),
                  h=H, w=H, interpret=True)
    o1 = qstage_fused(x_q, k=1, **kwargs)
    o2 = qstage_fused(x_q, k=2, **kwargs)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))
