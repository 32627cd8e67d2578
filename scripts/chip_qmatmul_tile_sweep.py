"""Same-process tile-shape sweep for qmatmul_fused at 4096^3 int8.

The 89%-of-peak number (BASELINE.md round 1) was measured at the default
(bm, bn, bk) = (1024, 512, 4096).  This sweeps the block shapes inside one
process (drift-free) to see whether any tiling clears 90%: interleaved
2-trial slope-fits per shape, correctness asserted against the default
tiling's output before timing.

Usage: python scripts/chip_qmatmul_tile_sweep.py [M] [K] [N] [--int4]
  --int4: weights packed 2-per-byte, unpacked in VMEM (the config-5 serving
  weight format) — measures the in-kernel-unpack path's % of int8 peak.
"""
import statistics
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import V5E_INT8_OPS, time_scan_fit
from qtpu.ops.pallas.qmatmul import pack_int4_halves, qmatmul_fused

INT4 = "--int4" in sys.argv
argv = [a for a in sys.argv[1:] if not a.startswith("--")]
M = int(argv[0]) if len(argv) > 0 else 4096
K = int(argv[1]) if len(argv) > 1 else 4096
N = int(argv[2]) if len(argv) > 2 else 4096
KEY = jax.random.PRNGKey(0)

TILES = [
    (1024, 512, 4096),   # default (round-1 89%)
    (512, 512, 4096),
    (512, 1024, 4096),
    (1024, 1024, 2048),
    (2048, 512, 4096),
    (1024, 256, 4096),
    (512, 2048, 4096),
    (2048, 1024, 2048),
    (4096, 512, 4096),
    (1024, 512, 2048),
]


def main() -> int:
    k1, k2 = jax.random.split(KEY)
    x_q = jax.random.randint(k1, (M, K), -127, 128, jnp.int8)
    lim = 8 if INT4 else 128
    w_q = jax.random.randint(k2, (K, N), -lim + 1, lim, jnp.int8)
    kw = dict(act_scale=jnp.float32(0.02), act_zp=jnp.int32(3),
              w_scale=jnp.abs(jax.random.normal(KEY, (N,))) * 0.01 + 1e-3,
              colsum=jnp.sum(w_q.astype(jnp.int32), 0),
              w_packed=INT4)

    y_ref = None
    good = []
    for bm, bn, bk in TILES:
        if M % bm or N % bn or K % bk:
            continue
        if INT4 and (bn // 2) % 128:
            continue
        try:
            w_in = pack_int4_halves(w_q, bn) if INT4 else w_q
            y = qmatmul_fused(x_q, w_in, bm=bm, bn=bn, bk=bk, **kw)
            y = np.asarray(y)
            if y_ref is None:
                y_ref = y
            assert np.array_equal(y, y_ref), f"tiling changed the result!"
            good.append((bm, bn, bk))
            print(f"ok ({bm:4d},{bn:4d},{bk:4d})", flush=True)
        except Exception as e:
            print(f"SKIP ({bm},{bn},{bk}): {str(e)[:120]}", flush=True)

    flops = 2.0 * M * N * K
    rates = {t: [] for t in good}
    for trial in range(2):
        for bm, bn, bk in good:
            w_in = pack_int4_halves(w_q, bn) if INT4 else w_q

            def body(c, w_in=w_in, bm=bm, bn=bn, bk=bk):
                y = qmatmul_fused(c, w_in, bm=bm, bn=bn, bk=bk, **kw)
                # chain: fold the f32 output back into the int8 carry
                return (c.astype(jnp.int32)
                        + (y[:1, :1] * 0).astype(jnp.int32)).astype(jnp.int8)
            t = time_scan_fit(body, x_q, n_short=10, n_long=60)
            tops = flops / t / 1e12
            rates[(bm, bn, bk)].append(tops)
            print(f"t{trial} ({bm:4d},{bn:4d},{bk:4d}): {t*1e6:9.1f} us "
                  f"-> {tops:6.1f} TOPS ({100*tops*1e12/V5E_INT8_OPS:4.1f}%"
                  f" of peak)", flush=True)

    print("\n=== medians ===", flush=True)
    for tile in good:
        med = statistics.median(rates[tile])
        print(f"({tile[0]:4d},{tile[1]:4d},{tile[2]:4d}): {med:6.1f} TOPS "
              f"({100*med*1e12/V5E_INT8_OPS:4.1f}% of peak)", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
