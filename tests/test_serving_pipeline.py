"""Double-buffered ServingEngine scheduler (VERDICT r4 #1).

The pipelined single-host scheduler dispatches batch k+1 while batch k's
results are still on device; these tests pin its semantics: result
correctness under bursty and trickled traffic, equivalence with the serial
scheduler, error propagation (a failing round must fail ITS futures and
kill the engine without hanging any caller), and stats sanity.
"""
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.parallel import make_mesh
from qtpu.serve import ServingEngine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def _lenet_serve():
    m = get_model("lenet5")
    x = jax.random.normal(KEY, (8, 28, 28, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init)(KEY, x))
    v = calibrate(qm, v, [x])
    return freeze(qm, v, x)


@pytest.mark.parametrize("pipeline", [False, True])
def test_results_correct_under_saturation(pipeline):
    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(4, 8), max_wait_ms=2.0,
                        pipeline=pipeline)
    try:
        n = 64
        xs = np.asarray(jax.random.normal(KEY, (n, 28, 28, 1)))
        ref = np.asarray(jax.jit(sm.apply)(sv, jnp.asarray(xs)))
        futs = [eng.submit(xs[i]) for i in range(n)]
        out = np.stack([f.result(timeout=60) for f in futs])
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)
        st = eng.stats()
        assert st["images"] == n and st["batches"] >= n // 8
    finally:
        eng.stop()


def test_trickled_requests_resolve_promptly():
    """With an empty queue the pending round resolves immediately — a lone
    request must not wait for a successor round to flush it."""
    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(1, 4), max_wait_ms=1.0, pipeline=True)
    try:
        x = np.asarray(jax.random.normal(KEY, (28, 28, 1)))
        eng.submit(x).result(timeout=60)        # warm compile
        for _ in range(3):
            t0 = time.monotonic()
            eng.submit(x).result(timeout=60)
            assert time.monotonic() - t0 < 5.0  # resolves without successor
    finally:
        eng.stop()


def test_forward_error_fails_futures_and_engine():
    # a forward that raises at TRACE time on the second bucket shape:
    # deterministic failure — bucket 4 compiles, bucket 8 raises
    def flaky(_v, x):
        if int(x.shape[0]) == 8:
            raise RuntimeError("boom")
        return jnp.zeros((int(x.shape[0]), 4)) + x.mean()

    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(4, 8), max_wait_ms=5.0,
                        forward_fn=flaky, pipeline=True)
    try:
        xs = np.asarray(jax.random.normal(KEY, (4, 28, 28, 1)))
        futs = [eng.submit(xs[i]) for i in range(4)]
        for f in futs:
            f.result(timeout=60)                 # bucket-4 round works
        futs = [eng.submit(xs[i % 4]) for i in range(8)]
        errs = 0
        for f in futs:
            try:
                f.result(timeout=60)
            except Exception:
                errs += 1
        assert errs == 8                         # every future failed
        deadline = time.monotonic() + 10
        while eng.healthy and time.monotonic() < deadline:
            time.sleep(0.05)
        assert not eng.healthy
        with pytest.raises(RuntimeError):
            eng.submit(xs[0])
    finally:
        eng.stop()


def test_submit_validates_dtype_and_shape():
    """Malformed requests fail their OWN caller at submit() — they must
    never reach the scheduler, where one bad image would fail a whole
    packed round (and desynchronize multi-host lockstep programs)."""
    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(4,), max_wait_ms=1.0)
    try:
        x = np.asarray(jax.random.normal(KEY, (28, 28, 1)))
        eng.submit(x).result(timeout=60)
        # same_kind casts are accepted (f64 request into an f32 engine)
        eng.submit(x.astype(np.float64)).result(timeout=60)
        with pytest.raises(ValueError):              # shape mismatch
            eng.submit(np.zeros((28, 27, 1), np.float32))
        with pytest.raises(ValueError):              # broadcastable != equal
            eng.submit(np.zeros((28, 28, 3), np.float32))
        assert eng.healthy                           # engine unharmed
        eng.submit(x).result(timeout=60)
    finally:
        eng.stop()


def test_submit_refuses_unsafe_cast_on_u8_engine():
    """A float image submitted to a uint8-ingest engine is refused (not
    silently truncated to zeros)."""
    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(4,), max_wait_ms=1.0,
                        raw_dtype=np.uint8,
                        forward_fn=lambda _v, x:
                            jnp.zeros((int(x.shape[0]), 10)))
    try:
        eng.submit(np.zeros((28, 28, 1), np.uint8)).result(timeout=60)
        with pytest.raises(ValueError):
            eng.submit(np.zeros((28, 28, 1), np.float32) * 0.5)
        assert eng.healthy
    finally:
        eng.stop()


def test_pending_round_delivered_when_next_dispatch_fails():
    """Pipeline: if round k+1 fails to DISPATCH, round k's already-computed
    results must still be delivered to their callers (not failed with
    k+1's unrelated error)."""
    w = jax.random.normal(KEY, (784, 784))

    def fwd(_v, x):
        if int(x.shape[0]) == 8:
            raise RuntimeError("boom8")
        y = x.reshape(int(x.shape[0]), -1)
        for _ in range(60):          # slow bucket-4 forward (~100ms CPU)
            y = jnp.tanh(y @ w)
        return y

    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(4, 8), max_wait_ms=2.0,
                        forward_fn=fwd, pipeline=True)
    try:
        xs = np.asarray(jax.random.normal(KEY, (8, 28, 28, 1)))
        eng.submit(xs[0]).result(timeout=120)        # warm bucket-4 compile
        good = [eng.submit(xs[i]) for i in range(4)]
        time.sleep(0.1)              # let round k dispatch (slow forward)
        bad = [eng.submit(xs[i]) for i in range(8)]
        for f in good:               # k's logits arrive despite k+1's crash
            assert f.result(timeout=120).shape == (784,)
        errs = sum(1 for f in bad if f.exception(timeout=120) is not None)
        assert errs == 8
    finally:
        eng.stop()


def test_stop_mid_stream_never_hangs_callers():
    sm, sv = _lenet_serve()
    eng = ServingEngine(sm, sv,
                        mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
                        batch_buckets=(4,), max_wait_ms=1.0, pipeline=True)
    xs = np.asarray(jax.random.normal(KEY, (4, 28, 28, 1)))
    futs = [eng.submit(xs[i % 4]) for i in range(16)]
    stopper = threading.Thread(target=eng.stop)
    stopper.start()
    done = 0
    for f in futs:
        try:
            f.result(timeout=60)
            done += 1
        except Exception:
            pass
    stopper.join(timeout=60)
    assert not stopper.is_alive()
    # every future terminated one way or the other (none hang)
    assert all(f.done() for f in futs)
