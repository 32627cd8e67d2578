"""Request-latency A/B: f32 image ingest vs uint8 wire ingest.

Round-2 latency analysis (BASELINE.md) showed request latency through the
tunneled host is dominated by host->device transfer (~4.8 MB per B=8 f32
round).  The uint8 wire formats upload 4x less:

* quantized stem → host-side fused normalize+quantize to int8 codes
  (native preprocess -> ServingEngine preprocess_fn -> forward_codes);
* EXCLUDED fp32 stem (the recommended serving config) → raw 0-255 uint8
  + on-device normalize (forward_u8) — the round-5 composition that makes
  the two round-4 serving wins coexist (VERDICT r4 #2).

Measures per-request submit->result latency through the REAL ServingEngine
for each path, same process, plus output parity within each config.

Usage: python scripts/chip_ingest_bench.py [n_requests]
Receipts: bench_receipts/ingest_bench_r5.jsonl
"""
import sys
import time

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import numpy as np

from qtpu.bench.receipts import log_receipt

N = int(sys.argv[1]) if len(sys.argv) > 1 else 40
RECEIPT = "ingest_bench_r5"


def main() -> int:
    import dataclasses

    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    rng = np.random.default_rng(0)
    x8 = rng.integers(0, 256, (N, 224, 224, 3), dtype=np.uint8)
    xf = x8.astype(np.float32) / 255.0

    for cfg_name in ("resnet50_imagenet_int8_ptq",
                     "resnet50_imagenet_int8_ptq_fp32stem"):
        cfg = dataclasses.replace(CONFIGS[cfg_name], serve=False)
        results = {}
        preds = {}
        for label, uint8_ingest in (("f32 ", False), ("int8", True)):
            eng, info = build_engine(cfg, buckets=(1, 8),
                                     uint8_ingest=uint8_ingest,
                                     max_wait_ms=0.5)
            imgs = x8 if uint8_ingest else xf
            eng.predict(imgs[:2])        # warm the request path
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
            print(f"{cfg_name} {label} ingest ({info['serve_path']}): "
                  f"p50 {results[label][0]:6.1f} ms  "
                  f"p90 {results[label][1]:6.1f} ms  "
                  f"(busy {st['images_per_sec_busy']:.0f} img/s)", flush=True)
            log_receipt(RECEIPT, dict(config=cfg_name, ingest=label.strip(),
                                      serve_path=info["serve_path"],
                                      p50_ms=results[label][0],
                                      p90_ms=results[label][1], n=N))
        agree = float(np.mean(preds["f32 "].argmax(-1)
                              == preds["int8"].argmax(-1)))
        rel = float(np.max(np.abs(preds["f32 "] - preds["int8"]))
                    / (np.max(np.abs(preds["f32 "])) + 1e-9))
        speedup = results["f32 "][0] / results["int8"][0]
        print(f"{cfg_name}: parity argmax {agree:.3f} max-rel {rel:.4f}; "
              f"p50 speedup {speedup:.2f}x", flush=True)
        log_receipt(RECEIPT, dict(config=cfg_name, argmax_agreement=agree,
                                  max_rel=rel, p50_speedup=speedup))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
