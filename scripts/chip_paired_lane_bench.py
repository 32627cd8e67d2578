"""Paired-pixel lane packing: the decisive microbenchmark (VERDICT r3 #6).

The round-3 p0 post-mortem diagnosed layer1's 2-D chain loss as lane fill:
Cmid=64 half-fills the 128 MXU/VPU lanes in the flattened (rows, C)
layout, while "XLA's conv fusions use paired pixels internally".  The
proposed fix — pack 2 adjacent pixels per row, (rows/2, 2C) — was never
tried.  Before building a paired qstage variant, this bench measures the
primitive that decides it: for each GEMM shape in the layer1 chain, the
UNPAIRED form vs the PAIRED equivalent at identical useful FLOPs:

* conv2 tap   (M,64)@(64,64)    vs (M/2,128)@blockdiag(W,W) (128,128)
* conv3       (M,64)@(64,256)   vs (M/2,128)@blockdiag     (128,512)
* conv1       (M,256)@(256,64)  vs (M/2,512)@blockdiag     (512,128)
* odd-dx tap: the paired layout needs TWO off-diagonal-block GEMMs per
  odd tap (pixel pairs straddle the shift) — measured as 2x the blockdiag
  time with half-empty weights, reported for the 3x3 cost model.

If paired blockdiag >= ~1.5x faster per useful FLOP, the lane-fill theory
holds and a paired qstage is worth building; if parity, Mosaic already
packs K=64 sublanes efficiently and the idea dies here with this receipt.

All forms use qmatmul_fused (the 91%-of-peak kernel) with identical int8
requant epilogues; y[:1,:1]*0 chain (custom calls cannot be slice-sunk).
Usage: python scripts/chip_paired_lane_bench.py [B]
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.receipts import log_receipt
from qtpu.bench.timing import V5E_INT8_OPS, time_scan_fit
from qtpu.ops.pallas.qmatmul import qmatmul_fused

KEY = jax.random.PRNGKey(0)


def blockdiag(w):
    k, n = w.shape
    z = jnp.zeros((k, n), jnp.int8)
    return jnp.concatenate([jnp.concatenate([w, z], 1),
                            jnp.concatenate([z, w], 1)], 0)


def offdiag(w, upper):
    """One off-diagonal block (odd-tap weight): in-p1->out-p0 or p0->p1."""
    k, n = w.shape
    z = jnp.zeros((k, n), jnp.int8)
    if upper:
        return jnp.concatenate([jnp.concatenate([z, z], 1),
                                jnp.concatenate([w, z], 1)], 0)
    return jnp.concatenate([jnp.concatenate([z, w], 1),
                            jnp.concatenate([z, z], 1)], 0)


def bench(label, M, w, useful_flops, n_gemms=1, bm=512, bk=None, bn=None):
    K, N = w.shape
    x = jax.random.randint(KEY, (M, K), -100, 100, jnp.int8)
    kw = dict(act_scale=jnp.float32(0.02), act_zp=jnp.int32(3),
              w_scale=jnp.full((N,), 0.01, jnp.float32),
              colsum=jnp.sum(w.astype(jnp.int32), 0))
    bk = bk or K
    bn = bn or N

    def body(c):
        y = None
        for g in range(n_gemms):
            o = qmatmul_fused(c, w, bm=min(bm, M), bn=bn, bk=bk, **kw)
            y = o if y is None else y + o
        return (c.astype(jnp.int32)
                + (y[:1, :1] * 0).astype(jnp.int32)).astype(jnp.int8)

    t = time_scan_fit(body, x, n_short=10, n_long=60, reps=2)
    tops = useful_flops / t / 1e12
    print(f"{label:42s} {t*1e6:9.1f} us  useful {tops:6.1f} TOPS "
          f"({100*tops*1e12/V5E_INT8_OPS:5.1f}% of peak)", flush=True)
    log_receipt("paired_lane_r5", dict(label=label, us=t * 1e6,
                                       useful_tops=tops))
    return t


def main() -> int:
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    M = B * 56 * 56                          # layer1 rows (B, 56^2)
    k1, k2, k3 = jax.random.split(KEY, 3)
    w_tap = jax.random.randint(k1, (64, 64), -127, 128, jnp.int8)
    w3 = jax.random.randint(k2, (64, 256), -127, 128, jnp.int8)
    w1 = jax.random.randint(k3, (256, 64), -127, 128, jnp.int8)

    for trial in range(2):
        print(f"-- trial {trial} --", flush=True)
        f_tap = 2.0 * M * 64 * 64
        t_u = bench("conv2 tap unpaired (M,64)@(64,64)", M, w_tap, f_tap)
        t_p = bench("conv2 tap paired blockdiag (M/2,128)@128^2",
                    M // 2, blockdiag(w_tap), f_tap)
        t_o = bench("odd tap paired: 2x offdiag GEMMs",
                    M // 2, offdiag(w_tap, True), f_tap, n_gemms=2)
        f3 = 2.0 * M * 64 * 256
        t3u = bench("conv3 unpaired (M,64)@(64,256)", M, w3, f3)
        t3p = bench("conv3 paired blockdiag (M/2,128)@(128,512)",
                    M // 2, blockdiag(w3), f3)
        f1 = 2.0 * M * 256 * 64
        t1u = bench("conv1 unpaired (M,256)@(256,64)", M, w1, f1)
        t1p = bench("conv1 paired blockdiag (M/2,512)@(512,128)",
                    M // 2, blockdiag(w1), f1)
        # 3x3 cost model: unpaired = 9 even-style taps; paired = 3 blockdiag
        # + 6 odd taps at 2 GEMMs each
        c_un = 9 * t_u
        c_pr = 3 * t_p + 6 * t_o
        print(f"3x3 conv model: unpaired 9 taps {c_un*1e3:7.2f} ms, paired "
              f"3 even + 6 odd {c_pr*1e3:7.2f} ms -> paired/unpaired "
              f"{c_pr/c_un:5.2f}x", flush=True)
        blk_un = t1u + c_un + t3u
        blk_pr = t1p + c_pr + t3p
        print(f"whole-block model: unpaired {blk_un*1e3:7.2f} ms, paired "
              f"{blk_pr*1e3:7.2f} ms -> {blk_un/blk_pr:5.2f}x speedup",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
