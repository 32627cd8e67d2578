"""Fused projection tail (qproj) vs the engine's XLA sequence.

Must be BIT-IDENTICAL to gemm_1x1(down → f32) + gemm_1x1(conv3 + f32
residual → int8) — the kernel mirrors that epilogue order exactly.
Interpret mode on CPU; real-chip check in scripts/chip_qtail_bench.py.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops.pallas.qproj import proj_coeffs, qproj_fused
from qtpu.serve.fused_ops import gemm_1x1

KEY = jax.random.PRNGKey(13)


def _node(key, ci, co, *, zp, scale):
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (1, 1, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(scale),
        "act_zp": jnp.int32(zp),
    }


@pytest.mark.parametrize("B,H,cmid,cin,cout,pair", [
    (2, 8, 64, 64, 256, 2),      # layer1_0 shape (paired, the on-chip form)
    (2, 8, 64, 64, 256, 1),      # same, unpaired (interpret only)
    (2, 6, 128, 256, 512, 1),    # layer2_0 shape
])
def test_qproj_bit_identical_to_sequence(B, H, cmid, cin, cout, pair):
    W = H
    ks = jax.random.split(KEY, 6)
    c3 = _node(ks[0], cmid, cout, zp=9, scale=0.017)
    down = _node(ks[1], cin, cout, zp=-4, scale=0.023)
    next_grid = (jnp.float32(0.019), jnp.int32(-3))
    b = jax.random.randint(ks[2], (B, H, W, cmid), -128, 128, jnp.int8)
    xd = jax.random.randint(ks[3], (B, H, W, cin), -128, 128, jnp.int8)

    @jax.jit   # jitted as one program (see test_pallas_qtail.py note)
    def ref_fn(b, xd):
        res = gemm_1x1(xd, down, relu=False, requant=None,
                       out_dtype=jnp.float32, use_pallas=False)
        return gemm_1x1(b, c3, relu=True, requant=next_grid,
                        out_dtype=jnp.int8, residual=res, res_grid=None,
                        use_pallas=False)
    ref = ref_fn(b, xd)

    out = qproj_fused(b, xd, w3=c3["kernel_q"].reshape(cmid, cout),
                      wd=down["kernel_q"].reshape(cin, cout),
                      **proj_coeffs(c3, down, next_grid),
                      pair=pair, interpret=True)
    assert out.shape == ref.shape
    mismatch = np.sum(np.asarray(ref) != np.asarray(out))
    assert mismatch == 0, f"{mismatch}/{ref.size} codes differ"


def test_engine_qproj_parity():
    """Engine with qproj == engine without, bit-exact (CPU interpret)."""
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.serve.experimental import \
        ExperimentalResNetInt8Engine as ResNetInt8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (2, 16, 16, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    eng_ref = ResNetInt8Engine(sv, arch, use_qtail=False, use_qproj=False)
    eng_p = ResNetInt8Engine(sv, arch, use_qtail=False, use_qproj=True,
                             qtail_interpret=True)
    assert "layer1_0" in eng_p._qproj_prep
    np.testing.assert_array_equal(np.asarray(eng_ref.forward(x)),
                                  np.asarray(eng_p.forward(x)))


@pytest.mark.parametrize("B,H,cmid,cin,cout", [
    (2, 8, 64, 64, 256),
    (2, 6, 128, 256, 512),
])
def test_qproj2d_bit_identical_to_sequence(B, H, cmid, cin, cout):
    from qtpu.ops.pallas.qproj import qproj2d_fused

    W = H
    ks = jax.random.split(jax.random.fold_in(KEY, 2), 6)
    c3 = _node(ks[0], cmid, cout, zp=9, scale=0.017)
    down = _node(ks[1], cin, cout, zp=-4, scale=0.023)
    next_grid = (jnp.float32(0.019), jnp.int32(-3))
    b = jax.random.randint(ks[2], (B, H, W, cmid), -128, 128, jnp.int8)
    xd = jax.random.randint(ks[3], (B, H, W, cin), -128, 128, jnp.int8)

    @jax.jit
    def ref_fn(b, xd):
        res = gemm_1x1(xd, down, relu=False, requant=None,
                       out_dtype=jnp.float32, use_pallas=False)
        return gemm_1x1(b, c3, relu=True, requant=next_grid,
                        out_dtype=jnp.int8, residual=res, res_grid=None,
                        use_pallas=False)
    ref = np.asarray(ref_fn(b, xd)).reshape(-1, cout)

    m = B * H * W
    out = qproj2d_fused(b.reshape(m, cmid), xd.reshape(m, cin),
                        w3=c3["kernel_q"].reshape(cmid, cout),
                        wd=down["kernel_q"].reshape(cin, cout),
                        **proj_coeffs(c3, down, next_grid),
                        bm=m // 2, interpret=True)
    mismatch = np.sum(ref != np.asarray(out))
    assert mismatch == 0, f"{mismatch}/{ref.size} codes differ"
