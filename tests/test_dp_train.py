"""Data-parallel training via fit(..., mesh=) (VERDICT r3 #3).

SURVEY.md §2.3 DP row: the QAT trainer must be data-parallel-capable, not
just the serving path.  On the 8-virtual-device CPU mesh these tests pin

* step-equivalence: the DP train step (batch sharded over 'data', params
  replicated, grads psum'd by GSPMD) produces the same parameters as the
  single-device step on the same global batch — for the fp32 baseline AND
  a fake-quant QAT model (whose observer EMAs must also agree);
* that the state actually stays replicated across steps;
* the CLI reachability: ``run_experiment(..., dp=...)`` end-to-end.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.parallel import make_mesh
from qtpu.train import create_train_state, make_train_step
from qtpu.transform import convert_model

KEY = jax.random.PRNGKey(0)


def _train_n_steps(model, mesh, n_steps=3, batch=16):
    tx = optax.adamw(1e-3)
    x0 = jnp.zeros((2, 28, 28, 1))
    state = create_train_state(model, KEY, x0, tx)
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rep = NamedSharding(mesh, PartitionSpec())
        state = jax.tree.map(lambda l: jax.device_put(l, rep), state)
    step = make_train_step(model, tx, mesh=mesh)
    metrics = None
    for i in range(n_steps):
        kx = jax.random.fold_in(KEY, i)
        x = jax.random.normal(kx, (batch, 28, 28, 1))
        y = jax.random.randint(jax.random.fold_in(kx, 1), (batch,), 0, 10)
        state, metrics = step(state, x, y)
    return state, metrics


@pytest.mark.parametrize("quantized", [False, True])
def test_dp_step_equivalence(quantized):
    model = get_model("lenet5")
    if quantized:
        model = convert_model(model, QuantPolicy.int8_qat())
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    s1, m1 = _train_n_steps(model, mesh=None)
    s2, m2 = _train_n_steps(model, mesh=mesh)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
        s1.params, s2.params)
    if quantized:  # observer/EMA stats over the global batch must agree
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5),
            s1.extra, s2.extra)


def test_dp_state_stays_replicated():
    model = get_model("lenet5")
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    state, _ = _train_n_steps(model, mesh=mesh, n_steps=2)

    def assert_replicated(leaf):
        if hasattr(leaf, "sharding"):
            assert leaf.sharding.is_fully_replicated, leaf.sharding

    jax.tree.map(assert_replicated, state.params)
    jax.tree.map(assert_replicated, state.opt_state)


def test_dp_batch_divisibility_error():
    from qtpu.data.datasets import Dataset
    from qtpu.train import fit

    model = get_model("lenet5")
    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    ds = Dataset(images=np.zeros((8, 28, 28, 1), np.float32),
                 labels=np.zeros((8,), np.int32), num_classes=10,
                 synthetic=True)
    with pytest.raises(ValueError, match="divide"):
        fit(model, ds, epochs=1, batch_size=6, mesh=mesh)


def test_run_experiment_dp_reachable():
    """`python -m qtpu.examples.run --config lenet_mnist_int8 --dp 2` shape:
    the whole experiment (fp32 fit -> PTQ -> eval) under DP training."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.examples.run import run_experiment

    cfg = dataclasses.replace(
        CONFIGS["lenet_mnist_int8"], fp32_epochs=1, batch_size=8,
        n_train=32, n_eval=16, calib_batches=1)
    result = run_experiment(cfg, verbose=False, dp=2)
    assert "top1_delta" in result
