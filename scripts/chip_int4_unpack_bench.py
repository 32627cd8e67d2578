"""On-chip check + microbench: in-kernel int4 unpack (VERDICT r1 item 5).

Exactness: w_packed=True must match unpack-outside bit-for-bit on the chip.
Perf: ResNet-50 1x1 GEMM shapes at small M (the weight-bound serving regime)
— packed weights halve the HBM weight traffic; slope-fit timing in-process.
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.ops.pallas.qmatmul import pack_int4_halves, qmatmul_fused

KEY = jax.random.PRNGKey(0)


def run(M, K, N, bn, bm):
    xq = jax.random.randint(KEY, (M, K), -127, 128, dtype=jnp.int8)
    w4 = jax.random.randint(jax.random.fold_in(KEY, 1), (K, N), -7, 8,
                            dtype=jnp.int8)
    ws = jax.random.uniform(jax.random.fold_in(KEY, 2), (N,), jnp.float32,
                            0.001, 0.01)
    cs = jnp.sum(w4.astype(jnp.int32), axis=0)
    b = jax.random.normal(jax.random.fold_in(KEY, 3), (N,))
    kw = dict(act_scale=jnp.float32(0.02), act_zp=jnp.int32(5), w_scale=ws,
              colsum=cs, bias=b, requant_scale=jnp.float32(0.05),
              requant_zp=jnp.int32(-3), relu=True, out_dtype=jnp.int8,
              bm=bm, bn=bn, bk=min(K, 4096))
    wp = pack_int4_halves(w4, bn)
    ref = np.asarray(qmatmul_fused(xq, w4, **kw))
    got = np.asarray(qmatmul_fused(xq, wp, w_packed=True, **kw))
    exact = np.array_equal(ref, got)

    f_unpacked = jax.jit(lambda x: qmatmul_fused(x, w4, **kw))
    f_packed = jax.jit(lambda x: qmatmul_fused(x, wp, w_packed=True, **kw))
    def mk(fn):
        def body(c):
            return c ^ fn(c)[0, 0]      # data-dependent carry: no elision
        return body
    tu = time_scan_fit(mk(f_unpacked), xq, n_short=20, n_long=100)
    tp = time_scan_fit(mk(f_packed), xq, n_short=20, n_long=100)
    wbytes = K * N
    print(f"M={M:5d} K={K:4d} N={N:4d}: exact={exact}  "
          f"unpacked {tu*1e6:7.1f} us  packed {tp*1e6:7.1f} us  "
          f"speedup {tu/tp:4.2f}x  (w={wbytes/1e6:.2f} MB int8)")
    return exact


def main() -> int:
    ok = True
    # ResNet-50 1x1 shapes (conv3/down of layer3/layer4) in the serving
    # latency regime (M = B*H*W small) where weight traffic dominates:
    for M, K, N in [(1024, 1024, 2048), (256, 2048, 512), (4096, 512, 1024),
                    (1024, 512, 2048), (16384, 1024, 2048)]:
        ok &= run(M, K, N, bn=min(512, N), bm=min(512, M))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
