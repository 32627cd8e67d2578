"""Worker process for tests/test_multihost.py (not a test module).

Each of two OS processes runs this script: distributed bring-up over gloo,
a (data=2, model=2) global mesh spanning both processes, a frozen int8
LeNet served through ServingEngine's lockstep multi-host scheduler.  Every
process submits its own distinct requests and checks its results against a
locally-computed unsharded reference.  Prints "WORKER_OK <n_served>" on
success.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_backend_optimization_level" not in flags:
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags.strip()

import jax

jax.config.update("jax_platforms", "cpu")

from qtpu.parallel.distributed import initialize_from_env

assert initialize_from_env(), "distributed init did not activate"

import jax.numpy as jnp
import numpy as np

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.parallel import make_mesh
from qtpu.serve import ServingEngine
from qtpu.transform import calibrate, convert_model, freeze


def wedge_main() -> int:
    """Wedged-peer scenario (QTPU_TEST_WEDGE=1): process 1 builds an engine
    whose scheduler never joins the lockstep allgather; process 0's round
    watchdog (round_timeout_s) must fail the in-flight future and flip
    healthy=False instead of hanging forever."""
    import time

    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    key = jax.random.PRNGKey(0)
    model = get_model("lenet5", num_classes=10)
    x0 = jax.random.normal(key, (4, 28, 28, 1))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(key, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    smodel, svars = freeze(qm, qv, x0)
    mesh = make_mesh(dp=2, tp=2)

    sentinel = os.environ.get("QTPU_TEST_WEDGE_SENTINEL", "")
    if pid == 1:
        class WedgedEngine(ServingEngine):
            def _loop_multihost(self):      # never joins a round
                time.sleep(3600)

        WedgedEngine(smodel, svars, mesh=mesh, batch_buckets=(2, 4))
        # stay alive while the peer times out; exit BEFORE the leader does
        # (the coordination service kills followers when the leader dies)
        for _ in range(300):
            if sentinel and os.path.exists(sentinel):
                break
            time.sleep(0.2)
        print("WORKER_WEDGE_PEER_DONE", flush=True)
        os._exit(0)

    engine = ServingEngine(smodel, svars, mesh=mesh, batch_buckets=(2, 4),
                           max_wait_ms=10.0, round_timeout_s=3.0)
    engine._img_shape = (28, 28, 1)         # no collective warmup: peer wedged
    fut = engine.submit(np.zeros((28, 28, 1), np.float32))
    try:
        fut.result(timeout=60)
        print("WORKER_WEDGE_FAIL future resolved", flush=True)
        os._exit(1)
    except TimeoutError as e:
        assert "round_timeout_s" in str(e), e
    assert not engine.healthy
    try:
        engine.submit(np.zeros((28, 28, 1), np.float32))
        print("WORKER_WEDGE_FAIL submit accepted after death", flush=True)
        os._exit(1)
    except RuntimeError:
        pass
    print("WORKER_WEDGE_OK", flush=True)
    if sentinel:                            # let the follower exit first
        with open(sentinel, "w") as f:
            f.write("ok")
        time.sleep(3.0)
    os._exit(0)                             # scheduler thread is stuck in the
    # collective by design — _exit instead of a clean join


def main() -> int:
    if os.environ.get("QTPU_TEST_WEDGE"):
        return wedge_main()
    assert jax.process_count() == 2, jax.process_count()
    pid = jax.process_index()

    # identical deterministic build in every process (same seed)
    key = jax.random.PRNGKey(0)
    model = get_model("lenet5", num_classes=10)
    x0 = jax.random.normal(key, (4, 28, 28, 1))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(key, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    smodel, svars = freeze(qm, qv, x0)

    # local (unsharded, single-device) reference logits
    imgs = np.asarray(jax.random.normal(jax.random.fold_in(key, 9),
                                        (8, 28, 28, 1)))
    ref = np.asarray(smodel.apply(svars, jnp.asarray(imgs)))

    # global mesh: 'data' across the two processes, 'model' within each
    mesh = make_mesh(dp=2, tp=2)
    engine = ServingEngine(smodel, svars, mesh=mesh, batch_buckets=(2, 4),
                           max_wait_ms=50.0)
    engine.warmup((28, 28, 1))

    mine = imgs[pid * 4:(pid + 1) * 4]
    got = engine.predict(mine)
    engine.stop()

    want = ref[pid * 4:(pid + 1) * 4]
    if not np.allclose(got, want, rtol=1e-5, atol=1e-5):
        print(f"WORKER_FAIL maxdiff={np.max(np.abs(got - want))}")
        return 1
    if not (got.argmax(-1) == want.argmax(-1)).all():
        print("WORKER_FAIL argmax")
        return 1
    st = engine.stats()
    print(f"WORKER_OK {int(st['images'])}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
