"""Full-stage kernel (qstage_proj: projection block + identity chain) vs the
engine's XLA sequence.

The fused stage must be BIT-IDENTICAL to the engine's projection path
(gemm_1x1 -> conv_xla -> gemm_1x1 + f32 downsample residual) followed by the
per-block identity sequence, because the engine dispatches whole stride-1
stages (ResNet layer1) through it.  Interpret mode on CPU; on-chip A/B in
scripts/chip_qstage_ab.py --proj.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops.pallas.qstage import (proj_stage_coeffs, qstage_proj_fused,
                                    stage_coeffs)
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

KEY = jax.random.PRNGKey(23)


def _node(key, kh, kw, ci, co, *, zp, scale):
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


def _proj(key, cp, cm, co):
    ks = jax.random.split(key, 4)
    c1 = _node(ks[0], 1, 1, cp, cm, zp=3, scale=0.02)
    c2 = _node(ks[1], 3, 3, cm, cm, zp=-11, scale=0.015)
    c3 = _node(ks[2], 1, 1, cm, co, zp=7, scale=0.018)
    down = {**_node(ks[3], 1, 1, cp, co, zp=0, scale=0.02),
            "act_scale": c1["act_scale"], "act_zp": c1["act_zp"]}
    return c1, c2, c3, down


def _chain(key, nblk, cin, cmid):
    blocks = []
    for i in range(nblk):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        c1 = _node(ks[0], 1, 1, cin, cmid, zp=5 - i, scale=0.021 + 0.002 * i)
        c2 = _node(ks[1], 3, 3, cmid, cmid, zp=-17 + i, scale=0.013)
        c3 = _node(ks[2], 1, 1, cmid, cin, zp=9, scale=0.017 - 0.001 * i)
        blocks.append((c1, c2, c3))
    return blocks


def _ref_stage(x_q, proj, blocks, next_grid):
    """The exact engine sequence: XLA projection block, then the chain."""
    c1, c2, c3, down = proj
    a = gemm_1x1(x_q, c1, relu=True, requant=grid_of(c2),
                 out_dtype=jnp.int8, use_pallas=False)
    b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
    res = gemm_1x1(x_q, down, relu=False, requant=None,
                   out_dtype=jnp.float32, use_pallas=False)
    x_q = gemm_1x1(b, c3, relu=True, requant=grid_of(blocks[0][0])[:2],
                   out_dtype=jnp.int8, residual=res, res_grid=None,
                   use_pallas=False)
    for i, (c1, c2, c3) in enumerate(blocks):
        tgt = (grid_of(blocks[i + 1][0])[:2] if i + 1 < len(blocks)
               else next_grid)
        a = gemm_1x1(x_q, c1, relu=True, requant=grid_of(c2),
                     out_dtype=jnp.int8, use_pallas=False)
        b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
        x_q = gemm_1x1(b, c3, relu=True, requant=tgt, out_dtype=jnp.int8,
                       residual=x_q, res_grid=grid_of(c1), use_pallas=False)
    return x_q


def _weights(proj, blocks):
    c1, c2, c3, down = proj
    cp = c1["kernel_q"].shape[-2]
    cm = c1["kernel_q"].shape[-1]
    co = c3["kernel_q"].shape[-1]
    cmid = blocks[0][0]["kernel_q"].shape[-1]
    return dict(
        wp1=c1["kernel_q"].reshape(cp, cm),
        wp2=c2["kernel_q"].reshape(9, cm, cm),
        wp3=c3["kernel_q"].reshape(cm, co),
        wd=down["kernel_q"].reshape(cp, co),
        w1=jnp.stack([b[0]["kernel_q"].reshape(co, cmid) for b in blocks]),
        w2=jnp.concatenate([b[1]["kernel_q"].reshape(9, cmid, cmid)
                            for b in blocks]),
        w3=jnp.stack([b[2]["kernel_q"].reshape(cmid, co) for b in blocks]),
    )


@pytest.mark.parametrize("B,H,cp,cm,co,cmid,nblk", [
    (2, 7, 64, 64, 256, 64, 2),     # layer1-ish geometry
    (2, 5, 128, 64, 256, 128, 1),   # Cp != Cm != Cmid cross-check
])
def test_qstage_proj_bit_identical(B, H, cp, cm, co, cmid, nblk):
    W = H
    proj = _proj(KEY, cp, cm, co)
    blocks = _chain(jax.random.fold_in(KEY, 5), nblk, co, cmid)
    next_grid = (jnp.float32(0.019), jnp.int32(-3))
    x_q = jax.random.randint(jax.random.fold_in(KEY, 99),
                             (B, H, W, cp), -128, 128, jnp.int8)

    ref = _ref_stage(x_q, proj, blocks, next_grid)
    out = qstage_proj_fused(
        x_q.reshape(B * H * W, cp), **_weights(proj, blocks),
        **proj_stage_coeffs(proj, blocks, next_grid),
        h=H, w=W, k=1, interpret=True)

    ref_np = np.asarray(ref).reshape(B * H * W, co)
    out_np = np.asarray(out)
    mismatch = np.sum(ref_np != out_np)
    assert mismatch == 0, f"{mismatch}/{ref_np.size} codes differ"


def test_engine_qstage_proj_bitwise_parity():
    """Engine dispatching the FULL stride-1 stage == per-block XLA engine."""
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.serve.experimental import \
        ExperimentalResNetInt8Engine as ResNetInt8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(2, 2, 2, 2))
    x = jax.random.normal(KEY, (2, 32, 32, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(2, 2, 2, 2), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    ref = ResNetInt8Engine(sv, arch)
    eng = ResNetInt8Engine(sv, arch, use_qstage=True, qstage_interpret=True,
                           qstage_proj=True)
    # stage 0's projection block is stride-1: chained into the stage kernel
    assert 0 in eng._qstage_prep and "wp1" in eng._qstage_prep[0]["weights"]
    # strided stages keep the XLA projection + identity-only chain
    assert all("wp1" not in eng._qstage_prep[i]["weights"]
               for i in (1, 2, 3) if i in eng._qstage_prep)
    y_ref = np.asarray(ref.forward(x))
    y_q = np.asarray(eng.forward(x))
    assert np.array_equal(y_ref, y_q)
