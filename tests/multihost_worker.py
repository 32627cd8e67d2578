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


def main() -> int:
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
