"""On-chip latency-serving operating points: ResNet-50 INT8 forward latency.

Throughput bench (bench.py) runs B=128; serving also cares about small-batch
latency.  Slope-fit per-step latency at B in {1, 4, 8, 32} plus the
ServingEngine's request p50/p99 at a small bucket — the numbers a serving
deployment picks its bucket sizes from.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def main() -> int:
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    eng = ResNetInt8Engine(sv, arch)
    for B in (1, 4, 8, 32):
        x = jax.random.normal(KEY, (B, 224, 224, 3))
        def body(c):
            out = eng.forward(c)
            return c + out[0, 0] * 0.0
        t = time_scan_fit(body, x, n_short=8, n_long=30)
        print(f"B={B:3d}: {t*1e3:7.3f} ms/step  ({B/t:8.0f} img/s)",
              flush=True)

    # Request-level p50/p99 through the ServingEngine (continuous batching):
    # 4 client threads push individual images as fast as results come back,
    # so the scheduler actually packs buckets under contention.
    import threading

    from qtpu.parallel import make_mesh
    from qtpu.serve import ServingEngine

    sengine = ServingEngine(
        None, sv, mesh=make_mesh(dp=1, tp=1, devices=jax.devices()[:1]),
        batch_buckets=(8, 32), max_wait_ms=2.0,
        forward_factory=lambda svv: ResNetInt8Engine(svv, arch)._forward)
    sengine.warmup((224, 224, 3))
    img = np.random.default_rng(0).normal(
        size=(224, 224, 3)).astype(np.float32)
    n_per_client, n_clients = 100, 4

    def client():
        for _ in range(n_per_client):
            sengine.submit(img).result()

    threads = [threading.Thread(target=client) for _ in range(n_clients)]
    t0 = time.monotonic()
    for th in threads:
        th.start()
    for th in threads:
        th.join()
    wall = time.monotonic() - t0
    st = sengine.stats()
    sengine.stop()
    print(f"serving: {n_clients}x{n_per_client} reqs in {wall:.2f}s  "
          f"p50={st['p50_ms']:.2f}ms p99={st['p99_ms']:.2f}ms "
          f"occ={st['mean_occupancy']:.2f} "
          f"busy_img/s={st['images_per_sec_busy']:.0f}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
