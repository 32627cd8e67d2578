"""Same-process e2e A/B: torch_pad geometry vs SAME geometry (VERDICT r3 #1).

Round 4 wired torch-imported checkpoints onto the flat int8 engines by
teaching the engines the torchvision geometry (explicit symmetric pads on
the 7x7 stem, the 3x3/2 max-pool, and strided 3x3 convs, where XLA SAME
pads (0,1)).  The acceptance question: does the torch-geometry engine run
within noise of the SAME-geometry headline number?  Both engines are
built first from the same frozen variables (the pad geometry changes only
the `lax.pad` configuration, not the weights), then interleaved slope-fits.

Usage: python scripts/chip_torchpad_ab.py [B] [trials]
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

from qtpu.bench.receipts import log_receipt
from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    trials = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    x = jax.random.normal(KEY, (B, 224, 224, 3))

    # SAME-geometry variables serve both engines: the pad flag changes the
    # engine's explicit pad calls, not the weight tensors (same shapes).
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True))
    qv = calibrate(qm, qv, [x0])
    sv = freeze(qm, qv, x0)[1]

    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    engines = {
        "same": ResNetInt8Engine(sv, arch),
        "torch": ResNetInt8Engine(sv, dict(arch, torch_pad=True)),
    }

    times = {k: [] for k in engines}
    for t in range(trials):
        for name, eng in engines.items():
            def body(c, eng=eng):
                return c + eng.forward(c)[0, 0] * 0.0

            dt = time_scan_fit(body, x, n_short=5, n_long=20, reps=2)
            times[name].append(dt)
            print(f"  t{t} {name:6s}: {dt*1e3:7.3f} ms ({B/dt:8.0f} img/s)",
                  flush=True)
            log_receipt("torchpad_ab_r5", dict(trial=t, variant=name,
                                               ms=dt * 1e3, img_s=B / dt,
                                               B=B))

    print(f"\n=== medians (B={B}, {trials} interleaved trials) ===",
          flush=True)
    med_same = statistics.median(times["same"])
    for name in ("same", "torch"):
        med = statistics.median(times[name])
        print(f"{name:6s}: {med*1e3:7.3f} ms ({B/med:8.0f} img/s)  "
              f"vs same {med_same/med:5.3f}x", flush=True)
        log_receipt("torchpad_ab_r5", dict(variant=name, median_ms=med * 1e3,
                                           median_img_s=B / med,
                                           vs_same=med_same / med, B=B))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
