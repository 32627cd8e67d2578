"""Pod acceptance: MEASURE 1->N-chip DP serving scaling, assert >=85%.

The environment this framework was built in has ONE physical TPU chip, so
the >=85% scaling-efficiency target (SURVEY.md §6 / BASELINE.json north
star) ships as a MODEL (qtpu.bench.scaling_projection, recorded in
BASELINE.md).  THIS script is the real measurement, ready to run the
moment a multi-chip slice appears:

    python scripts/pod_scaling_accept.py [--tp N] [--batch-per-chip B]

It builds the frozen ResNet-50 int8 flat engine, shards it over
dp = n_devices/tp (weights replicated over 'data', TP-sharded over
'model' when --tp > 1), measures images/sec at dp in {1, 2, ..., N} with
constant per-chip batch (slope-fit scan timing, same-process), and exits
nonzero if efficiency at the largest dp falls below 85% of linear.

Refuses to "pass" on a single chip or on virtual CPU devices — it prints
the projection pointer instead, so a green exit always means a real
multi-chip measurement.
"""
import json
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

THRESHOLD = 0.85


def main() -> int:
    argv = sys.argv[1:]
    tp = int(argv[argv.index("--tp") + 1]) if "--tp" in argv else 1
    bpc = (int(argv[argv.index("--batch-per-chip") + 1])
           if "--batch-per-chip" in argv else 128)

    devs = jax.devices()
    if devs[0].platform != "tpu" or len(devs) < 2:
        print(json.dumps(dict(
            skipped=True,
            reason=f"{len(devs)} x {devs[0].platform} devices — need >=2 "
                   "real TPU chips; the standing evidence is the MODEL in "
                   "qtpu.bench.scaling_projection / BASELINE.md")))
        return 0 if "--allow-skip" in argv else 1

    import jax.numpy as jnp

    from qtpu.bench.timing import time_scan_fit
    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.parallel import batch_sharding, make_mesh, shard_variables
    from qtpu.serve.resnet_engine import ResNetInt8Engine
    from qtpu.transform import calibrate, convert_model, freeze

    key = jax.random.PRNGKey(0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(key, (2, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = dict(jax.jit(qm.init, static_argnames="train")(key, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    _, sv = freeze(qm, qv, x0)

    n = len(devs)
    dps = sorted({1, 2, n // (2 * tp) or 1, n // tp})
    results = {}
    for dp in dps:
        if dp * tp > n or dp < 1:
            continue
        mesh = make_mesh(dp=dp, tp=tp, devices=devs[:dp * tp])
        sv_sharded = dict(sv)
        sv_sharded["qweights"] = shard_variables(
            dict(qweights=sv["qweights"]), mesh)["qweights"]
        eng = ResNetInt8Engine(sv_sharded, arch)
        B = bpc * dp
        x = jax.device_put(jnp.zeros((B, 224, 224, 3), jnp.float32),
                           batch_sharding(mesh))

        def body(c):
            return c + 0.0 * eng.forward(c)[0, 0]

        dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
        results[dp] = B / dt
        print(f"dp={dp} tp={tp}: {B / dt:10.0f} img/s "
              f"({dt * 1e3:.3f} ms/step @ B={B})", flush=True)

    base = results[min(results)] / min(results)   # img/s per dp unit @ min dp
    eff = {dp: results[dp] / (dp * base) for dp in results}
    worst = min(eff[max(eff)], 1.0)
    print(json.dumps(dict(images_per_sec=results, efficiency=eff,
                          measured=True, n_devices=n, tp=tp,
                          passes=worst >= THRESHOLD)))
    if worst < THRESHOLD:
        print(f"FAIL: efficiency {worst:.3f} < {THRESHOLD}", flush=True)
        return 1
    print(f"PASS: efficiency {worst:.3f} >= {THRESHOLD}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
