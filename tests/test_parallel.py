"""Mesh/sharding/serving tests on the 8-virtual-device CPU mesh (SURVEY §4.2)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.parallel import (MODEL_AXIS, batch_sharding, make_mesh,
                           shard_variables)
from qtpu.serve import ServingEngine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def frozen_lenet():
    m = get_model("lenet5")
    x = jax.random.normal(KEY, (8, 28, 28, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init)(KEY, x)
    qv = calibrate(qm, qv, [x])
    sm, sv = freeze(qm, qv, x)
    return sm, sv, x


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh(dp=4, tp=2)
    assert mesh.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        make_mesh(dp=3, tp=2)


def test_sharded_forward_matches_single_device(frozen_lenet):
    sm, sv, x = frozen_lenet
    y_ref = np.asarray(jax.jit(sm.apply)(sv, x))
    mesh = make_mesh(dp=4, tp=2)
    svs = shard_variables(sv, mesh)
    # fc1 kernel (400, 120): 120 % 2 == 0 -> sharded over 'model'
    fc1 = svs["qweights"]["fc1"]["kernel_q"]
    assert any(MODEL_AXIS in str(s) for s in [fc1.sharding.spec])
    xs = jax.device_put(x, batch_sharding(mesh))
    y = np.asarray(jax.jit(sm.apply)(svs, xs))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-4)


def test_tp_only_mesh(frozen_lenet):
    sm, sv, x = frozen_lenet
    y_ref = np.asarray(jax.jit(sm.apply)(sv, x))
    mesh = make_mesh(dp=1, tp=8)
    svs = shard_variables(sv, mesh)
    xs = jax.device_put(x, batch_sharding(mesh))
    y = np.asarray(jax.jit(sm.apply)(svs, xs))
    np.testing.assert_allclose(y, y_ref, atol=1e-4, rtol=1e-4)


def test_serving_engine_end_to_end(frozen_lenet):
    sm, sv, x = frozen_lenet
    y_ref = np.asarray(jax.jit(sm.apply)(sv, x))
    eng = ServingEngine(sm, sv, mesh=make_mesh(dp=4, tp=2),
                        batch_buckets=(1, 2, 4, 8), max_wait_ms=20.0)
    try:
        out = eng.predict(np.asarray(x))
        np.testing.assert_allclose(out, y_ref, atol=1e-4, rtol=1e-4)
        st = eng.stats()
        assert st["images"] == 8
        assert st["p99_ms"] > 0
    finally:
        eng.stop()


def test_serving_engine_single_requests(frozen_lenet):
    sm, sv, x = frozen_lenet
    eng = ServingEngine(sm, sv, mesh=make_mesh(dp=1, tp=1,
                                               devices=jax.devices()[:1]),
                        batch_buckets=(1, 2, 4), max_wait_ms=1.0)
    try:
        futs = [eng.submit(np.asarray(x[i])) for i in range(3)]
        outs = [f.result(timeout=120) for f in futs]
        assert all(o.shape == (10,) for o in outs)
    finally:
        eng.stop()


def test_dp_train_step_on_mesh():
    """QAT train step under jit with a data-sharded batch: grads come out
    replicated (XLA inserts the psum) and params stay replicated."""
    import optax
    from qtpu.train import create_train_state, make_train_step

    model = get_model("lenet5", quant=QuantPolicy.int8_qat())
    x = jax.random.normal(KEY, (16, 28, 28, 1))
    y = jnp.zeros((16,), jnp.int32)
    tx = optax.sgd(1e-2)
    state = create_train_state(model, KEY, x[:2], tx)
    step = make_train_step(model, tx)
    mesh = make_mesh(dp=8, tp=1)
    xs = jax.device_put(x, batch_sharding(mesh))
    ys = jax.device_put(y, batch_sharding(mesh))
    state2, metrics = step(state, xs, ys)
    assert jnp.isfinite(metrics["loss"])
    # params remain fully addressable/replicated after the update
    k = state2.params["conv1"]["kernel"]
    assert k.shape == (5, 5, 1, 6)


def test_serving_engine_with_flat_engine_forward(frozen_lenet):
    """ServingEngine accepts a custom forward_fn (flat-engine route)."""
    sm, sv, x = frozen_lenet
    calls = []

    def fwd(variables, batch):
        calls.append(1)
        return sm.apply(variables, batch)

    eng = ServingEngine(sm, sv, mesh=make_mesh(dp=1, tp=1,
                                               devices=jax.devices()[:1]),
                        batch_buckets=(4, 8), max_wait_ms=5.0,
                        forward_fn=fwd)
    try:
        out = eng.predict(np.asarray(x[:4]))
        assert out.shape == (4, 10)
        assert calls  # custom forward traced
    finally:
        eng.stop()


def test_collective_report_parses_async_pairs():
    """overlap.collective_report: counts collectives + start/done overlap."""
    from qtpu.bench.overlap import collective_report

    hlo = "\n".join([
        "%ag-start = bf16[8]{0} all-gather-start(%p0), dimensions={0}",
        '%f = bf16[8]{0} fusion(%x), kind=kOutput, calls=%c',
        "%conv = bf16[8]{0} convolution(%f, %w)",
        "%ag-done = bf16[8]{0} all-gather-done(%ag-start)",
        "%ar = bf16[8]{0} all-reduce(%conv), to_apply=%add",
    ])
    rep = collective_report(hlo)
    # async -start forms count too (a hidden all-gather is still a collective)
    assert rep["collectives"] == {"all-gather": 1, "all-reduce": 1}
    assert rep["async_pairs"] == 1
    assert rep["async_pairs_with_compute_between"] == 1


def test_collective_report_counts_permutes():
    """The spatial/pipeline programs emit collective-permute(-start)s."""
    from qtpu.bench.overlap import collective_report

    hlo = "\n".join([
        "%cp-start = s8[2]{0} collective-permute-start(%p0)",
        "%f = s8[2]{0} fusion(%x), kind=kLoop, calls=%c",
        "%cp-done = s8[2]{0} collective-permute-done(%cp-start)",
        "%cp2 = s8[2]{0} collective-permute(%f)",
    ])
    rep = collective_report(hlo)
    assert rep["collectives"] == {"collective-permute": 2}
    assert rep["async_pairs"] == 1


def test_virtual_mesh_tp_serve_emits_collectives(frozen_lenet):
    """The TP-sharded serve forward compiles with GSPMD collectives on the
    8-device mesh (the CPU analog of qtpu.bench.overlap's TPU AOT check)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from qtpu.parallel.mesh import serve_shardings

    sm, sv, x = frozen_lenet
    mesh = make_mesh(dp=1, tp=8)
    shardings = serve_shardings(sv, mesh)
    sv_shaped = jax.tree.map(
        lambda leaf, s: jax.ShapeDtypeStruct(leaf.shape, leaf.dtype,
                                             sharding=s), sv, shardings)
    x_shaped = jax.ShapeDtypeStruct(x.shape, x.dtype,
                                    sharding=NamedSharding(mesh, P()))
    hlo = jax.jit(sm.apply).lower(sv_shaped, x_shaped).compile().as_text()
    assert "all-gather" in hlo or "all-reduce" in hlo


def test_serving_engine_flat_resnet_forward_tp():
    """Config-4 shape: the flat ResNetInt8Engine built INSIDE the jitted
    forward from the TP-sharded variables serves correctly over the mesh."""
    from qtpu.serve.resnet_engine import ResNetInt8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("resnet18", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (8, 32, 32, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=False,
                cifar_stem=True, num_classes=10)
    ref = np.asarray(ResNetInt8Engine(sv, arch).forward(x))

    eng = ServingEngine(sm, sv, mesh=make_mesh(dp=4, tp=2),
                        batch_buckets=(8,), max_wait_ms=5.0,
                        forward_factory=lambda svs:
                        ResNetInt8Engine(svs, arch)._forward)
    try:
        out = eng.predict(np.asarray(x))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
    finally:
        eng.stop()


def test_serving_engine_scheduler_crash_fails_futures(frozen_lenet):
    """Failure detection (SURVEY §5.3): a forward that throws must fail the
    in-flight and queued futures, mark the engine unhealthy, and make later
    submits raise — never leave callers blocked forever."""
    sm, sv, x = frozen_lenet

    def boom(_v, _x):
        raise RuntimeError("device exploded")

    eng = ServingEngine(sm, sv, mesh=make_mesh(dp=1, tp=1,
                                               devices=jax.devices()[:1]),
                        batch_buckets=(1, 2), max_wait_ms=1.0,
                        forward_fn=boom)
    try:
        assert eng.healthy
        futs = [eng.submit(np.asarray(x[i])) for i in range(3)]
        for f in futs:
            with pytest.raises(RuntimeError):
                f.result(timeout=60)
        deadline = time.monotonic() + 30
        while eng.healthy and time.monotonic() < deadline:
            time.sleep(0.01)
        assert not eng.healthy
        with pytest.raises(RuntimeError):
            eng.submit(np.asarray(x[0]))
    finally:
        eng.stop()
