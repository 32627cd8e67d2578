"""Chained inverted-residual kernel (qivr) vs the MobileNet engine sequence.

The whole-run kernel must be BIT-IDENTICAL to the engine's per-block 3-op
sequence (gemm_1x1 expand+relu6 -> grouped conv_xla dw+relu6 -> gemm_1x1
project+residual, chained with each block requantizing onto the next
block's expand grid).  Interpret mode on CPU; hardware numbers in
scripts/chip_qivr_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops.pallas.qivr import ivr_coeffs, qivr_fused, stack_ivr_weights
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


def _chain(key, nblk, c, e):
    blocks = []
    for i in range(nblk):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        blocks.append((
            _node(ks[0], 1, 1, c, e, zp=3 - i, scale=0.019 + 0.002 * i),
            _node(ks[1], 3, 3, 1, e, zp=-128, scale=0.0235),   # post-relu6
            _node(ks[2], 1, 1, e, c, zp=7, scale=0.016 - 0.001 * i)))
    return blocks


def _ref_chain(x_q, blocks, next_grid):
    """The exact per-block sequence MobileNetV2Int8Engine runs today."""
    for i, (c1, c2, c3) in enumerate(blocks):
        tgt = (grid_of(blocks[i + 1][0])[:2] if i + 1 < len(blocks)
               else next_grid)
        a = gemm_1x1(x_q, c1, relu=True, act_max=6.0, requant=grid_of(c2),
                     out_dtype=jnp.int8, use_pallas=False)
        e = a.shape[-1]
        b = conv_xla(a, c2, strides=(1, 1), groups=e, relu=True, act_max=6.0,
                     requant=grid_of(c3))
        x_q = gemm_1x1(b, c3, relu=False, requant=tgt, out_dtype=jnp.int8,
                       residual=x_q, res_grid=grid_of(c1), use_pallas=False)
    return x_q


@pytest.mark.parametrize("B,H,c,e,nblk", [
    (2, 7, 160, 960, 2),    # late-stage geometry (7x7 run)
    (2, 8, 64, 384, 3),     # 14x14-ish run, 3-block chain
    (4, 4, 32, 192, 1),     # single block (degenerate chain)
    (2, 6, 96, 576, 2),     # non-lane-aligned expand width
])
def test_qivr_bit_identical_to_sequence(B, H, c, e, nblk):
    W = H
    blocks = _chain(KEY, nblk, c, e)
    next_grid = (jnp.float32(0.021), jnp.int32(-2))
    x_q = jax.random.randint(jax.random.fold_in(KEY, 99),
                             (B, H, W, c), -128, 128, jnp.int8)

    ref = _ref_chain(x_q, blocks, next_grid)
    out = qivr_fused(
        x_q.reshape(B * H * W, c), **stack_ivr_weights(blocks),
        **ivr_coeffs(blocks, next_grid), h=H, w=W, k=1, interpret=True)

    ref_np = np.asarray(ref).reshape(B * H * W, c)
    out_np = np.asarray(out)
    mismatch = np.sum(ref_np != out_np)
    assert mismatch == 0, f"{mismatch}/{ref_np.size} codes differ"


def test_qivr_k_tiling():
    """k > 1 (several images per grid step) must match k = 1."""
    B, H, c, e = 4, 5, 32, 192
    blocks = _chain(jax.random.fold_in(KEY, 1), 2, c, e)
    next_grid = (jnp.float32(0.02), jnp.int32(0))
    x_q = jax.random.randint(jax.random.fold_in(KEY, 7),
                             (B * H * H, c), -128, 128, jnp.int8)
    kwargs = dict(**stack_ivr_weights(blocks),
                  **ivr_coeffs(blocks, next_grid), h=H, w=H, interpret=True)
    o1 = qivr_fused(x_q, k=1, **kwargs)
    o2 = qivr_fused(x_q, k=2, **kwargs)
    assert np.array_equal(np.asarray(o1), np.asarray(o2))


def test_qivr_realistic_grids():
    """Post-relu6 grids (zp=-128) and tiny scales — the real MNv2 shape of
    the coefficient space, guarding the frozen-model regime."""
    B, H, c, e = 2, 6, 32, 192
    key = jax.random.fold_in(KEY, 5)
    blocks = []
    for i in range(2):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        blocks.append((
            _node(ks[0], 1, 1, c, e, zp=-128, scale=0.0235),
            _node(ks[1], 3, 3, 1, e, zp=-128, scale=0.0235),
            _node(ks[2], 1, 1, e, c, zp=1, scale=0.01)))
    next_grid = (jnp.float32(0.0235), jnp.int32(-128))
    x_q = jax.random.randint(jax.random.fold_in(key, 9),
                             (B, H, H, c), -128, 128, jnp.int8)
    ref = np.asarray(_ref_chain(x_q, blocks, next_grid)).reshape(-1, c)
    out = np.asarray(qivr_fused(
        x_q.reshape(-1, c), **stack_ivr_weights(blocks),
        **ivr_coeffs(blocks, next_grid), h=H, w=H, k=1, interpret=True))
    assert np.array_equal(ref, out)
