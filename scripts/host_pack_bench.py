"""Host-side A/B: np.stack+pad vs the native parallel batch pack.

The serving scheduler packs every round's images into one contiguous
bucket buffer before upload.  On a directly-attached host this pack sits
on the request critical path next to an ~8 ms device step, so its cost is
a real serving number, not a detail.  Pure host bench — no TPU needed.

Usage: python scripts/host_pack_bench.py [B] [trials]
Receipts: bench_receipts/host_pack_r5.jsonl
"""
import statistics
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from qtpu.bench.receipts import log_receipt
from qtpu.data import native

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
TRIALS = int(sys.argv[2]) if len(sys.argv) > 2 else 7
RECEIPT = "host_pack_r5"


def numpy_pack(images, pad_to):
    imgs = np.stack(images)
    if len(imgs) < pad_to:
        pad = np.zeros((pad_to - len(imgs), *imgs.shape[1:]), imgs.dtype)
        imgs = np.concatenate([imgs, pad])
    return imgs


def bench(fn, images, pad_to, reps=5):
    fn(images, pad_to)                      # warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(images, pad_to)
        best = min(best, time.perf_counter() - t0)
    assert out.shape[0] == pad_to
    return best


def main() -> int:
    rng = np.random.default_rng(0)
    assert native.load_native() is not None, "native lib required"
    for dtype, label in ((np.float32, "f32"), (np.uint8, "u8")):
        images = [rng.integers(0, 200, (224, 224, 3)).astype(dtype)
                  for _ in range(B)]
        mb = images[0].nbytes * B / 1e6
        rows = {"np.stack+pad": [], "native pack": []}
        for t in range(TRIALS):
            rows["np.stack+pad"].append(bench(numpy_pack, images, B))
            rows["native pack"].append(
                bench(lambda im, p: native.pack_batch(im, pad_to=p),
                      images, B))
        base = statistics.median(rows["np.stack+pad"])
        for name, ts in rows.items():
            med = statistics.median(ts)
            print(f"{label} B={B} ({mb:.0f} MB) {name:13s}: "
                  f"{med*1e3:7.2f} ms ({mb/1e3/med:6.1f} GB/s)  "
                  f"{base/med:5.2f}x", flush=True)
            log_receipt(RECEIPT, dict(dtype=label, B=B, variant=name,
                                      ms=med * 1e3, gbps=mb / 1e3 / med,
                                      vs_numpy=base / med))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
