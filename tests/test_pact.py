"""PACT learnable-clip activation quantizer (Choi et al. 2018, PAPERS.md).

Covers the op (values + the paper's α/x STE gradients), the ActQuant
integration (α is a trainable param; QAT updates it), and the
calibrate→freeze pipeline (a PACT layer's grid is affine_qparams(0, α)).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qtpu.models import get_model
from qtpu.nn import LayerQuantSpec, QuantMode, QuantPolicy
from qtpu.ops import fakequant as fq
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def test_fake_quant_pact_values():
    alpha = jnp.float32(2.0)
    x = jnp.array([-1.0, 0.0, 1.0, 2.5], jnp.float32)
    y = fq.fake_quant_pact(x, alpha, bits=8)
    s = np.float32(2.0) / np.float32(255.0)
    q1 = np.round(np.float32(1.0) / s)       # fp32 grid step, same as the op
    exp = np.array([0.0, 0.0, q1 * s, 2.0], np.float32)
    np.testing.assert_allclose(np.asarray(y), exp, atol=1e-6)


def test_fake_quant_pact_alpha_gradient_is_clip_mask():
    """∂/∂α Σ y = #{x ≥ α} — the PACT paper's STE."""
    alpha = jnp.float32(1.5)
    x = jnp.array([-0.5, 0.4, 1.0, 1.6, 3.0], jnp.float32)
    g = jax.grad(lambda a: jnp.sum(fq.fake_quant_pact(x, a)))(alpha)
    assert float(g) == 2.0          # two elements clip at the top
    gx = jax.grad(lambda x: jnp.sum(fq.fake_quant_pact(x, alpha)))(x)
    np.testing.assert_allclose(np.asarray(gx), [0, 1, 1, 0, 0], atol=1e-6)


def _pact_lenet():
    pol = QuantPolicy(default=LayerQuantSpec(act_observer="pact",
                                             pact_init=0.5),
                      mode=QuantMode.QUANT_EMA)
    m = get_model("lenet5")
    qm = convert_model(m, pol)
    x = jax.random.normal(KEY, (8, 28, 28, 1))
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    return qm, v, x


def test_alpha_is_trainable_param_and_learns():
    qm, v, x = _pact_lenet()
    alphas = [p for kp, p in
              jax.tree_util.tree_flatten_with_path(v["params"])[0]
              if "pact_alpha" in str(kp)]
    assert alphas, "no pact_alpha params created"
    assert all(float(a) == 0.5 for a in alphas)

    y = jnp.zeros((8,), jnp.int32)
    tx = optax.sgd(0.05)
    opt = tx.init(v["params"])

    def loss_fn(params):
        out, _ = qm.apply({**v, "params": params}, x,
                          mutable=["quant_stats"])
        return optax.softmax_cross_entropy_with_integer_labels(out, y).mean()

    grads = jax.grad(loss_fn)(v["params"])
    galpha = [p for kp, p in
              jax.tree_util.tree_flatten_with_path(grads)[0]
              if "pact_alpha" in str(kp)]
    # with α=0.5 most post-relu activations clip → nonzero α gradient
    assert any(float(jnp.abs(g)) > 0 for g in galpha)
    upd, _ = tx.update(grads, opt)
    new_params = optax.apply_updates(v["params"], upd)
    new_alphas = [p for kp, p in
                  jax.tree_util.tree_flatten_with_path(new_params)[0]
                  if "pact_alpha" in str(kp)]
    assert any(float(a) != 0.5 for a in new_alphas)


def test_pact_calibrate_freeze_grid():
    qm, v, x = _pact_lenet()
    v = calibrate(qm, v, [x])
    qp = v["quant_params"]
    flat = jax.tree_util.tree_flatten_with_path(qp)[0]
    scales = {tuple(str(k) for k in kp): p for kp, p in flat
              if "act_scale" in str(kp[-1])}
    zps = [p for kp, p in flat if "act_zp" in str(kp[-1])]
    assert scales and all(abs(float(s) - 0.5 / 255) < 1e-9
                          for s in scales.values())
    assert all(float(z) == 0.0 for z in zps)      # unsigned zp of [0, α]
    # freeze + integer serve runs end-to-end
    sm, sv = freeze(qm, v, x)
    out = jax.jit(sm.apply)(sv, x)
    assert out.shape == (8, 10) and bool(jnp.all(jnp.isfinite(out)))
