"""Debug-mode assertion tier (SURVEY.md §5.2 — chex/jax.debug checks).

Covers both tiers of qtpu.utils.debug: trace-time dtype checks on the integer
kernels and eager value checks on freeze() outputs, plus the off-by-default
guarantee (bad inputs pass silently when the toggle is off, so production
serving pays nothing).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.ops import qops
from qtpu.transform import calibrate, convert_model, freeze
from qtpu.utils import debug


@pytest.fixture
def debug_on():
    debug.enable(True)
    yield
    debug.enable(False)


def test_int_input_dtype_rejected(debug_on):
    x = jnp.ones((2, 8, 8, 4), jnp.float32)
    w = jnp.ones((3, 3, 4, 8), jnp.int8)
    with pytest.raises(AssertionError, match="qconv2d"):
        qops.qconv2d(x, w)
    with pytest.raises(AssertionError, match="qmatmul"):
        qops.qmatmul(jnp.ones((4, 8), jnp.int32), jnp.ones((8, 8), jnp.int8))


def test_int_input_dtype_rejected_under_jit(debug_on):
    # chex asserts fire at trace time — inside jit, before compilation.
    w = jnp.ones((8, 8), jnp.int8)
    with pytest.raises(AssertionError, match="qmatmul"):
        jax.jit(lambda a: qops.qmatmul(a, w))(jnp.ones((4, 8), jnp.float32))


def test_checks_off_by_default():
    assert not debug.enabled()
    # Wrong dtype passes through unchecked (XLA handles widening) — the
    # toggle really is off.
    out = qops.qmatmul(jnp.ones((4, 8), jnp.int32), jnp.ones((8, 8), jnp.int8))
    assert out.shape == (4, 8)


def test_freeze_outputs_pass_value_checks(debug_on):
    key = jax.random.PRNGKey(0)
    model = get_model("lenet5", num_classes=10)
    x = jax.random.normal(key, (4, 28, 28, 1))
    qmodel = convert_model(model, QuantPolicy.int8_ptq())
    qvars = jax.jit(qmodel.init, static_argnames="train")(key, x, train=True)
    qvars = calibrate(qmodel, dict(qvars), [x])
    # All frozen nodes run through check_frozen_node inside freeze().
    _, svars = freeze(qmodel, qvars, x)
    assert "qweights" in svars


def test_frozen_node_corruption_detected(debug_on):
    node = {
        "kernel_q": jnp.ones((3, 3, 4, 8), jnp.int8),
        "w_scale": jnp.full((8,), jnp.nan),
        "act_scale": jnp.float32(0.1),
        "act_zp": jnp.int32(-5),
        "bias": jnp.zeros((8,)),
        "colsum": jnp.full((8,), 36, jnp.int32),
    }
    with pytest.raises(AssertionError, match="non-finite"):
        debug.check_frozen_node(node, bits=8, packed=False, path="conv1")
    node["w_scale"] = jnp.full((8,), 0.01)
    node["colsum"] = jnp.zeros((8,), jnp.int32)   # wrong: should be 36
    with pytest.raises(AssertionError, match="colsum"):
        debug.check_frozen_node(node, bits=8, packed=False, path="conv1")
    node["colsum"] = jnp.full((8,), 36, jnp.int32)
    debug.check_frozen_node(node, bits=8, packed=False, path="conv1")


def test_frozen_node_int4_grid(debug_on):
    # codes at ±8 violate the symmetric int4 grid (±7)
    from qtpu.ops import fakequant as fq
    w = jnp.full((1, 1, 2, 8), -8, jnp.int8)
    node = {
        "kernel_q": fq.pack_int4(w, axis=-1),
        "w_scale": jnp.full((8,), 0.01),
        "act_scale": jnp.float32(0.1),
        "act_zp": jnp.int32(0),
        "bias": jnp.zeros((8,)),
        "colsum": jnp.sum(w.astype(jnp.int32), axis=(0, 1, 2)),
    }
    with pytest.raises(AssertionError, match="int4 grid"):
        debug.check_frozen_node(node, bits=4, packed=True, path="conv1")
