"""End-to-end BASELINE.json config 1: LeNet-5 / MNIST, per-tensor INT8
fake-quant conv+dense, min-max calibration, CPU-runnable.

This is the reference's example-driven test style (SURVEY.md §4.1) made into a
real integration test: train fp32 → PTQ-convert → calibrate → assert the INT8
top-1 is within a small delta of fp32.  Runs on the synthetic MNIST stand-in
(no real data offline), which keeps the accuracy-delta semantics.
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from qtpu.data import load_dataset
from qtpu.models import get_model
from qtpu.nn import LayerQuantSpec, QuantMode, QuantPolicy
from qtpu.train import evaluate, fit
from qtpu.transform import (calibrate, convert_model, quantize_variables,
                            set_mode)


@pytest.fixture(scope="module")
def trained_lenet():
    train = load_dataset("mnist", "train", n=4096)
    test = load_dataset("mnist", "test", n=1024)
    model = get_model("lenet5")
    state = fit(model, train, epochs=3, batch_size=128, lr=2e-3, seed=0)
    top1, _ = evaluate(model, state.variables(), test, batch_size=256)
    return model, state, train, test, top1


def test_fp32_baseline_learns(trained_lenet):
    _, _, _, _, top1 = trained_lenet
    assert top1 > 0.90, f"fp32 baseline only reached {top1}"


def test_int8_ptq_minmax_delta(trained_lenet):
    model, state, train, test, fp32_top1 = trained_lenet
    # per-tensor INT8 weights + affine INT8 acts, min-max calibration [config 1]
    spec = LayerQuantSpec(per_channel=False, act_observer="minmax")
    qmodel = convert_model(model, QuantPolicy(default=spec,
                                              mode=QuantMode.QUANT))
    variables = quantize_variables(qmodel, state.variables(),
                                   jnp.asarray(train.images[:2]))
    calib_batches = [jnp.asarray(train.images[i * 128:(i + 1) * 128])
                     for i in range(8)]
    variables = calibrate(qmodel, variables, calib_batches)
    q_top1, _ = evaluate(qmodel, variables, test, batch_size=256)
    delta = fp32_top1 - q_top1
    assert delta < 0.02, (
        f"INT8 PTQ top-1 delta too large: fp32={fp32_top1:.4f} "
        f"int8={q_top1:.4f} delta={delta:.4f}")

    # integer serving path: same accuracy from real int8 execution
    from qtpu.transform import freeze as freeze_fn
    smodel, svars = freeze_fn(qmodel, variables,
                              jnp.asarray(train.images[:2]))
    s_top1, _ = evaluate(smodel, svars, test, batch_size=256)
    assert fp32_top1 - s_top1 < 0.02, (
        f"INT8 serve top-1 delta too large: {fp32_top1:.4f} vs {s_top1:.4f}")


def test_int8_online_mode_delta(trained_lenet):
    """QUANT_ONLINE (per-batch min-max, no calibration) also stays close."""
    model, state, _, test, fp32_top1 = trained_lenet
    spec = LayerQuantSpec(per_channel=False)
    qmodel = convert_model(model, QuantPolicy(default=spec,
                                              mode=QuantMode.QUANT_ONLINE))
    qvars = quantize_variables(qmodel, state.variables(),
                               jnp.asarray(test.images[:2]))
    q_top1, _ = evaluate(qmodel, qvars, test, batch_size=256)
    assert fp32_top1 - q_top1 < 0.02


def test_exclude_first_last(trained_lenet):
    """The reference's canonical first/last-layer exclusion works end-to-end."""
    model, state, train, test, fp32_top1 = trained_lenet
    spec = LayerQuantSpec(per_channel=False)
    qmodel = convert_model(model, QuantPolicy(default=spec,
                                              mode=QuantMode.QUANT),
                           exclude=("conv1", "fc3"))
    variables = quantize_variables(qmodel, state.variables(),
                                   jnp.asarray(train.images[:2]))
    stats = variables.get("quant_stats", {})
    assert "conv1" not in stats and "fc3" not in stats
    variables = calibrate(qmodel, variables,
                          [jnp.asarray(train.images[:256])])
    q_top1, _ = evaluate(qmodel, variables, test, batch_size=256)
    assert fp32_top1 - q_top1 < 0.02
