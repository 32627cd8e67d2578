"""Integer-forward QAT path (qtpu.ops.qat_int) parity tests.

The claim under test (qat_int.py docstring): ``qat_int_conv`` computes the
SAME function as the fp32 fake-quant simulation
``conv(fake_quant(x), fake_quant_weight(w))`` — exactly, when every grid
value is exactly representable in fp32 (power-of-two scales, integer zero
points), because then the fp32 sim has no accumulation error either and
both sides are integer math.

Gradients are the passthrough-STE gradients of the sim path; scales and
zero points get zero gradient (SURVEY.md §3.3 — scales live outside
autograd; reference mount empty, SURVEY.md §0).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.nn.config import LayerQuantSpec, QuantMode, QuantPolicy
from qtpu.ops import fakequant as fq
from qtpu.ops.qat_int import int_forward_ok, qat_int_conv

KEY = jax.random.PRNGKey(7)


def _grid_inputs(key, shape, kshape, *, w_bits=8, act_symmetric=False,
                 act_scale=2.0 ** -6, zp_u=30.0):
    """(x, w, act_scale, zp_u) with every value exactly on a pow2 grid.

    Weights are crafted so fake_quant_weight's internally recomputed scale
    (max|w|/qmax) is exactly a power of two per channel: the per-channel max
    code is qmax itself.
    """
    kx, kw = jax.random.split(key)
    _, qmax = fq.qrange(w_bits, signed=True, symmetric=True)
    w_scale = 2.0 ** -7
    codes = jax.random.randint(kw, kshape, -qmax, qmax + 1, jnp.int32)
    # pin each output channel's amax to qmax so scale == w_scale exactly
    pin = jnp.zeros(kshape, jnp.int32).at[0, 0, 0, :].set(qmax)
    codes = jnp.where(pin > 0, pin, codes)
    w = codes.astype(jnp.float32) * w_scale

    if act_symmetric:
        q = jax.random.randint(kx, shape, -127, 128, jnp.int32)
        x = q.astype(jnp.float32) * act_scale
        return x, w, jnp.float32(act_scale), jnp.float32(0.0)
    q = jax.random.randint(kx, shape, 0, 256, jnp.int32)
    x = (q.astype(jnp.float32) - zp_u) * act_scale
    return x, w, jnp.float32(act_scale), jnp.float32(zp_u)


def _sim(x, w, act_scale, zp_u, *, w_bits=8, per_channel=True,
         act_symmetric=False, strides=(1, 1), padding="SAME", groups=1):
    """The reference fp32 fake-quant simulation (passthrough STE)."""
    xq = fq.fake_quant(x, act_scale, zp_u, bits=8, signed=act_symmetric,
                       symmetric=act_symmetric, ste="passthrough")
    wq = fq.fake_quant_weight(w, bits=w_bits,
                              channel_axis=3 if per_channel else None,
                              ste="passthrough")
    return jax.lax.conv_general_dilated(
        xq, wq, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups, precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)


CASES = [
    # name, act_symmetric, per_channel, w_bits, strides, padding, groups
    ("affine_pc_int8", False, True, 8, (1, 1), "SAME", 1),
    ("affine_pt_int8", False, False, 8, (1, 1), "SAME", 1),
    ("symmetric_pc_int8", True, True, 8, (1, 1), "SAME", 1),
    ("affine_pc_int4w", False, True, 4, (1, 1), "SAME", 1),
    ("stride2_valid", False, True, 8, (2, 2), "VALID", 1),
    ("depthwise", False, True, 8, (1, 1), "SAME", 16),
]


@pytest.mark.parametrize("name,act_sym,per_ch,w_bits,strides,padding,groups",
                         CASES, ids=[c[0] for c in CASES])
def test_forward_exact_on_grid(name, act_sym, per_ch, w_bits, strides,
                               padding, groups):
    cin, cout = 16, 16
    kshape = (3, 3, cin // groups, cout)
    x, w, s, zp = _grid_inputs(KEY, (2, 8, 8, cin), kshape, w_bits=w_bits,
                               act_symmetric=act_sym)
    y_int = qat_int_conv(x, w, s, zp, a_bits=8, w_bits=w_bits,
                         per_channel=per_ch, act_symmetric=act_sym,
                         strides=strides, padding=padding, groups=groups)
    y_sim = _sim(x, w, s, zp, w_bits=w_bits, per_channel=per_ch,
                 act_symmetric=act_sym, strides=strides, padding=padding,
                 groups=groups)
    # Exact: both sides are integer math scaled by pow2 factors.
    np.testing.assert_array_equal(np.asarray(y_int), np.asarray(y_sim))


def test_forward_close_off_grid():
    """Generic float inputs: int path == sim up to fp32 accumulation noise."""
    kx, kw = jax.random.split(KEY)
    x = jax.random.normal(kx, (2, 8, 8, 16))
    w = jax.random.normal(kw, (3, 3, 16, 24)) * 0.1
    s, zp = fq.affine_qparams(jnp.min(x), jnp.max(x), 8)
    y_int = qat_int_conv(x, w, s, zp)
    y_sim = _sim(x, w, s, zp)
    np.testing.assert_allclose(np.asarray(y_int), np.asarray(y_sim),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("act_sym,groups", [(False, 1), (True, 1), (False, 16)],
                         ids=["affine", "symmetric", "depthwise"])
def test_backward_grad_parity(act_sym, groups):
    cin, cout = 16, 16
    kshape = (3, 3, cin // groups, cout)
    x, w, s, zp = _grid_inputs(KEY, (2, 8, 8, cin), kshape,
                               act_symmetric=act_sym)
    kg = jax.random.fold_in(KEY, 3)
    g = jax.random.randint(kg, (2, 8, 8, cout), -4, 5, jnp.int32
                           ).astype(jnp.float32) * 2.0 ** -4

    def loss_int(x, w):
        y = qat_int_conv(x, w, s, zp, act_symmetric=act_sym, groups=groups)
        return jnp.sum(y * g)

    def loss_sim(x, w):
        y = _sim(x, w, s, zp, act_symmetric=act_sym, groups=groups)
        return jnp.sum(y * g)

    dx_i, dw_i = jax.grad(loss_int, argnums=(0, 1))(x, w)
    dx_s, dw_s = jax.grad(loss_sim, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_i), np.asarray(dx_s),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dw_i), np.asarray(dw_s),
                               rtol=1e-6, atol=1e-6)


def test_grid_params_get_zero_grad():
    x, w, s, zp = _grid_inputs(KEY, (1, 4, 4, 16), (3, 3, 16, 16))

    def loss(s, zp):
        return jnp.sum(qat_int_conv(x, w, s, zp))

    ds, dzp = jax.grad(loss, argnums=(0, 1))(s, zp)
    assert float(ds) == 0.0 and float(dzp) == 0.0


def test_int_forward_ok_fallback_logic():
    ok_spec = LayerQuantSpec()  # passthrough STE, minmax, both quantized
    mode = QuantMode.QUANT_EMA
    assert int_forward_ok(ok_spec, mode)
    assert not int_forward_ok(None, mode)
    assert not int_forward_ok(ok_spec, QuantMode.OFF)
    assert not int_forward_ok(ok_spec, QuantMode.CALIB_RANGE)
    assert not int_forward_ok(LayerQuantSpec(ste="clip"), mode)
    assert not int_forward_ok(LayerQuantSpec(act_observer="pact"), mode)
    assert not int_forward_ok(
        LayerQuantSpec(quantize_weights=False), mode)
    assert not int_forward_ok(
        LayerQuantSpec(quantize_acts=False), mode)


def test_quantconv_layer_int_vs_sim():
    """QuantConv with qat_forward='int' matches the sim layer, and the
    variable trees are structurally identical (checkpoint-compatible)."""
    from qtpu.nn.layers import QuantConv

    x = jax.random.normal(KEY, (2, 8, 8, 8))
    outs, trees = {}, {}
    for engine in ("sim", "int"):
        pol = QuantPolicy.int8_qat(qat_forward=engine)
        m = QuantConv(features=16, quant=pol, use_bias=True)
        v = m.init(jax.random.PRNGKey(0), x)
        y, _ = m.apply(v, x, mutable=["quant_stats"])
        outs[engine] = np.asarray(y)
        trees[engine] = jax.tree_util.tree_structure(v)
    assert trees["sim"] == trees["int"]
    np.testing.assert_allclose(outs["int"], outs["sim"], rtol=2e-5, atol=2e-5)


def test_quantconv_layer_int_qat_step_trains():
    """One optax QAT step through the int path runs and changes weights."""
    import optax

    from qtpu.nn.layers import QuantConv

    x = jax.random.normal(KEY, (2, 8, 8, 8))
    pol = QuantPolicy.int8_qat(qat_forward="int")
    m = QuantConv(features=16, quant=pol)
    v = m.init(jax.random.PRNGKey(0), x)
    params, stats, qp = v["params"], v["quant_stats"], v["quant_params"]
    tx = optax.sgd(0.1)
    opt = tx.init(params)

    @jax.jit
    def step(params, stats, opt):
        def loss_fn(p):
            y, upd = m.apply(
                {"params": p, "quant_stats": stats, "quant_params": qp}, x,
                mutable=["quant_stats"])
            return jnp.mean(y ** 2), upd["quant_stats"]

        (loss, new_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt = tx.update(grads, opt)
        return optax.apply_updates(params, updates), new_stats, opt, loss

    p1, s1, opt, l1 = step(params, stats, opt)
    p2, _, _, l2 = step(p1, s1, opt)
    assert np.isfinite(l1) and np.isfinite(l2)
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), params, p2)
    assert max(jax.tree_util.tree_leaves(diff)) > 0.0
