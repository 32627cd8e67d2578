"""On-chip ResNet-18 INT8 throughput (flat engine) — CIFAR and ImageNet stems.

Completes the model-family throughput table (ResNet-50/MobileNet-v1/v2 are
in BASELINE.md): config-2's arch (CIFAR 32² stem) and the ImageNet-stem
variant, one process, slope-fit batch sweep.
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from qtpu.bench.timing import time_scan_fit
from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def bench(cifar_stem: bool, size: int, batches) -> None:
    model = get_model("resnet18", num_classes=10 if cifar_stem else 1000,
                      cifar_stem=cifar_stem)
    x0 = jax.random.normal(KEY, (8, size, size, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(2, 2, 2, 2), width=64, bottleneck=False,
                cifar_stem=cifar_stem,
                num_classes=10 if cifar_stem else 1000)
    eng = ResNetInt8Engine(sv, arch)
    stem = "cifar" if cifar_stem else "imagenet"
    for B in batches:
        x = jax.random.normal(KEY, (B, size, size, 3))

        def body(c):
            return c + 0.0 * jnp.sum(eng._forward(c))

        t = time_scan_fit(body, x, n_short=5, n_long=25)
        print(f"resnet18/{stem} {size}x{size} B={B:4d}: "
              f"{t*1e3:7.3f} ms/step -> {B/t:8.0f} img/s", flush=True)


def main() -> int:
    bench(True, 32, (256, 512, 1024))
    bench(False, 224, (64, 128, 256))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
