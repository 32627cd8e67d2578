"""Checkpoint/resume round-trip (orbax) for QAT state and frozen weights."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.train import create_train_state, make_train_step
from qtpu.transform import calibrate, convert_model, freeze
from qtpu.utils import checkpoint as ckpt

KEY = jax.random.PRNGKey(0)


def test_qat_state_roundtrip(tmp_path):
    model = get_model("lenet5", quant=QuantPolicy.int8_qat())
    x = jax.random.normal(KEY, (4, 28, 28, 1))
    y = jnp.zeros((4,), jnp.int32)
    tx = optax.adam(1e-3)
    state = create_train_state(model, KEY, x, tx)
    step = make_train_step(model, tx)
    state, _ = step(state, x, y)
    tree = {"variables": state.variables(), "opt_state": state.opt_state,
            "step": state.step}
    path = os.path.join(tmp_path, "qat")
    ckpt.save(path, tree)
    restored = ckpt.load(path, target=tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # resume: one more step runs from the restored variables
    state2 = state.replace(params=restored["variables"]["params"])
    state2, metrics = step(state2, x, y)
    assert jnp.isfinite(metrics["loss"])


def test_frozen_serve_weights_roundtrip(tmp_path):
    model = get_model("lenet5")
    x = jax.random.normal(KEY, (4, 28, 28, 1))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = calibrate(qm, dict(jax.jit(qm.init)(KEY, x)), [x])
    sm, sv = freeze(qm, qv, x)
    path = os.path.join(tmp_path, "serve")
    ckpt.save(path, sv)
    restored = ckpt.load(path, target=sv)
    assert restored["qweights"]["conv1"]["kernel_q"].dtype == jnp.int8
    y1 = jax.jit(sm.apply)(sv, x)
    y2 = jax.jit(sm.apply)(restored, x)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))
