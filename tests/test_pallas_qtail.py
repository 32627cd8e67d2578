"""Fused bottleneck-tail kernel (qtail) vs the engine's 2-op XLA sequence.

The kernel must be BIT-IDENTICAL to the sequence it replaces
(conv_xla(conv2) -> gemm_1x1(conv3)+residual, int8 codes, folded affine
requant between), because the engine dispatches per-block and mixing paths
must not change results.  Interpret mode on CPU; the real-chip check is
scripts/chip_qtail_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops.pallas.qtail import qtail_fused, tail_coeffs
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

KEY = jax.random.PRNGKey(11)


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


@pytest.mark.parametrize("B,H,cmid,cout,pair", [
    (2, 8, 64, 256, 2),     # layer1 shape (paired, the on-chip form)
    (2, 8, 64, 256, 1),     # same, unpaired (interpret only)
    (2, 6, 128, 512, 1),    # layer2 shape
])
def test_qtail_bit_identical_to_sequence(B, H, cmid, cout, pair):
    W = H
    ks = jax.random.split(KEY, 6)
    c2 = _node(ks[0], 3, 3, cmid, cmid, zp=-17, scale=0.013)
    c3 = _node(ks[1], 1, 1, cmid, cout, zp=9, scale=0.017)
    next_grid = (jnp.float32(0.019), jnp.int32(-3))
    res_grid = (jnp.float32(0.021), jnp.int32(5))
    a = jax.random.randint(ks[2], (B, H, W, cmid), -128, 128, jnp.int8)
    r = jax.random.randint(ks[3], (B, H, W, cout), -128, 128, jnp.int8)

    # --- reference: the 2-op XLA sequence the engine runs without qtail ---
    # jitted as one program: under the conftest's -O0 CPU flags, eager
    # op-by-op execution makes different fp32 FMA-contraction choices than
    # compiled code, flipping ~0.04% of codes at exact .5 ties.  The engine
    # always runs jitted, so the jitted sequence is the real reference.
    @jax.jit
    def ref_fn(a, r):
        b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
        return gemm_1x1(b, c3, relu=True, requant=next_grid,
                        out_dtype=jnp.int8, residual=r, res_grid=res_grid,
                        use_pallas=False)
    ref = ref_fn(a, r)

    a_pad = jax.lax.pad(a, c2["act_zp"].astype(jnp.int8),
                        ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))
    out = qtail_fused(a_pad, r, w2=c2["kernel_q"].reshape(9, cmid, cmid),
                      w3=c3["kernel_q"].reshape(cmid, cout),
                      **tail_coeffs(c2, c3, next_grid, res_grid),
                      pair=pair, interpret=True)

    assert out.shape == ref.shape
    mismatch = np.sum(np.asarray(ref) != np.asarray(out))
    assert mismatch == 0, f"{mismatch}/{ref.size} codes differ"


def test_qtail_bb_tiling():
    B, H, cmid, cout = 4, 4, 128, 256
    ks = jax.random.split(jax.random.fold_in(KEY, 1), 4)
    c2 = _node(ks[0], 3, 3, cmid, cmid, zp=2, scale=0.01)
    c3 = _node(ks[1], 1, 1, cmid, cout, zp=-1, scale=0.015)
    next_grid = (jnp.float32(0.02), jnp.int32(0))
    res_grid = (jnp.float32(0.03), jnp.int32(-2))
    a = jax.random.randint(ks[2], (B, H, H, cmid), -128, 128, jnp.int8)
    r = jax.random.randint(ks[3], (B, H, H, cout), -128, 128, jnp.int8)
    a_pad = jax.lax.pad(a, c2["act_zp"].astype(jnp.int8),
                        ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))
    kwargs = dict(w2=c2["kernel_q"].reshape(9, cmid, cmid),
                  w3=c3["kernel_q"].reshape(cmid, cout),
                  **tail_coeffs(c2, c3, next_grid, res_grid),
                  interpret=True)
    o1 = qtail_fused(a_pad, r, bb=1, **kwargs)
    o4 = qtail_fused(a_pad, r, bb=4, **kwargs)
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o4))


def test_engine_qtail_parity():
    """Engine with qtail == engine without, bit-exact (CPU interpret)."""
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
    eng_ref = ResNetInt8Engine(sv, arch, use_qtail=False)
    eng_tail = ResNetInt8Engine(sv, arch, use_qtail=True,
                                qtail_interpret=True)
    assert "layer1_1" in eng_tail._qtail_prep
    y_ref = eng_ref.forward(x)
    y_tail = eng_tail.forward(x)
    np.testing.assert_array_equal(np.asarray(y_ref), np.asarray(y_tail))
