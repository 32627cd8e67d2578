"""Request-latency A/B: f32 image ingest vs uint8->int8-code ingest.

Round-2 latency analysis (BASELINE.md) showed request latency through the
tunneled host is dominated by host->device transfer (~4.8 MB per B=8 f32
round).  The int8 ingest path (native preprocess -> ServingEngine
preprocess_fn -> forward_codes) uploads 4x less.  This measures per-request
submit->result latency through the REAL ServingEngine for both paths, same
process, plus output parity.

Usage: python scripts/chip_ingest_bench.py [n_requests]
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import numpy as np

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40


def main() -> int:
    import dataclasses

    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = dataclasses.replace(CONFIGS["resnet50_imagenet_int8_ptq"],
                              serve=False)
    rng = np.random.default_rng(0)
    x8 = rng.integers(0, 256, (N, 224, 224, 3), dtype=np.uint8)
    xf = x8.astype(np.float32) / 255.0

    results = {}
    preds = {}
    for label, uint8_ingest in (("f32 ", False), ("int8", True)):
        eng, info = build_engine(cfg, buckets=(1, 8), uint8_ingest=uint8_ingest,
                                 max_wait_ms=0.5)
        imgs = x8 if uint8_ingest else xf
        # warm the request path
        eng.predict(imgs[:2])
        lats = []
        outs = []
        for i in range(N):
            t0 = time.monotonic()
            outs.append(eng.submit(imgs[i]).result())
            lats.append(time.monotonic() - t0)
        st = eng.stats()
        eng.stop()
        lats.sort()
        results[label] = (lats[len(lats) // 2] * 1e3,
                          lats[int(len(lats) * 0.9)] * 1e3)
        preds[label] = np.stack(outs)
        print(f"{label} ingest ({info['serve_path']}): "
              f"p50 {results[label][0]:6.1f} ms  p90 {results[label][1]:6.1f} ms"
              f"  (busy {st['images_per_sec_busy']:.0f} img/s)", flush=True)
    agree = float(np.mean(preds["f32 "].argmax(-1) == preds["int8"].argmax(-1)))
    rel = float(np.max(np.abs(preds["f32 "] - preds["int8"]))
                / (np.max(np.abs(preds["f32 "])) + 1e-9))
    print(f"parity: argmax agreement {agree:.3f}, max rel diff {rel:.4f}",
          flush=True)
    print(f"p50 speedup: {results['f32 '][0] / results['int8'][0]:.2f}x",
          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
