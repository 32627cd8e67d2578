"""Per-stage on-chip bench: qtail/qproj kernels vs their XLA sequences.

The e2e engine run showed qtail+qproj at 23.6ms vs XLA 8.4ms (B=128) despite
bit-exactness — this isolates WHICH stage shapes lose and by how much, and
sweeps bb to separate pipelining effects from body cost.
"""
import sys
import zlib

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.ops.pallas.qproj import proj_coeffs, qproj_fused
from qtpu.ops.pallas.qtail import qtail_fused, tail_coeffs
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KEY = jax.random.PRNGKey(3)


def _node(key, kh, kw, ci, co, *, zp, scale):
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (kh, kw, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(scale),
        "act_zp": jnp.int32(zp),
    }


def bench_tail(name, H, cmid, cout, pair, bbs):
    ks = jax.random.split(jax.random.fold_in(KEY, zlib.crc32(name.encode()) % 1000), 4)
    c2 = _node(ks[0], 3, 3, cmid, cmid, zp=-17, scale=0.013)
    c3 = _node(ks[1], 1, 1, cmid, cout, zp=9, scale=0.017)
    ng = (jnp.float32(0.019), jnp.int32(-3))
    rg = (jnp.float32(0.021), jnp.int32(5))
    a = jax.random.randint(ks[2], (B, H, H, cmid), -128, 128, jnp.int8)
    r = jax.random.randint(ks[3], (B, H, H, cout), -128, 128, jnp.int8)

    @jax.jit
    def xla_fn(a, r):
        b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
        return gemm_1x1(b, c3, relu=True, requant=ng, out_dtype=jnp.int8,
                        residual=r, res_grid=rg, use_pallas=False)

    co = tail_coeffs(c2, c3, ng, rg)
    w2 = c2["kernel_q"].reshape(9, cmid, cmid)
    w3 = c3["kernel_q"].reshape(cmid, cout)
    apad = jax.lax.pad(a, c2["act_zp"].astype(jnp.int8),
                       ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))

    def t_xla(c):
        out = xla_fn(c, r)
        return c ^ out[:, :, :, :cmid]
    t = time_scan_fit(t_xla, a, n_short=6, n_long=20)
    print(f"{name} xla      : {t*1e6:8.1f} us")
    for bb in bbs:
        def t_k(c, bb=bb):
            ap = jax.lax.pad(c, c2["act_zp"].astype(jnp.int8),
                             ((0, 0, 0), (1, 1, 0), (1, 1, 0), (0, 0, 0)))
            out = qtail_fused(ap, r, w2=w2, w3=w3, **co, pair=pair, bb=bb)
            return c ^ out[:, :, :, :cmid]
        try:
            t = time_scan_fit(t_k, a, n_short=6, n_long=20)
            print(f"{name} tail bb{bb:<3}: {t*1e6:8.1f} us")
        except Exception as e:
            print(f"{name} tail bb{bb:<3}: FAIL {str(e)[:120]}")


def bench_proj(name, H, cmid, cin, cout, pair, bbs):
    ks = jax.random.split(jax.random.fold_in(KEY, zlib.crc32(name.encode()) % 997), 4)
    c3 = _node(ks[0], 1, 1, cmid, cout, zp=9, scale=0.017)
    dn = _node(ks[1], 1, 1, cin, cout, zp=-4, scale=0.023)
    ng = (jnp.float32(0.019), jnp.int32(-3))
    b = jax.random.randint(ks[2], (B, H, H, cmid), -128, 128, jnp.int8)
    xd = jax.random.randint(ks[3], (B, H, H, cin), -128, 128, jnp.int8)

    @jax.jit
    def xla_fn(b, xd):
        res = gemm_1x1(xd, dn, relu=False, requant=None,
                       out_dtype=jnp.float32, use_pallas=False)
        return gemm_1x1(b, c3, relu=True, requant=ng, out_dtype=jnp.int8,
                        residual=res, res_grid=None, use_pallas=False)

    co = proj_coeffs(c3, dn, ng)
    w3 = c3["kernel_q"].reshape(cmid, cout)
    wd = dn["kernel_q"].reshape(cin, cout)

    def t_xla(c):
        out = xla_fn(c, xd)
        return c ^ out[:, :, :, :cmid]
    t = time_scan_fit(t_xla, b, n_short=6, n_long=20)
    print(f"{name} xla      : {t*1e6:8.1f} us")
    for bb in bbs:
        def t_k(c, bb=bb):
            out = qproj_fused(c, xd, w3=w3, wd=wd, **co, pair=pair, bb=bb)
            return c ^ out[:, :, :, :cmid]
        try:
            t = time_scan_fit(t_k, c := b, n_short=6, n_long=20)
            print(f"{name} proj bb{bb:<3}: {t*1e6:8.1f} us")
        except Exception as e:
            print(f"{name} proj bb{bb:<3}: FAIL {str(e)[:120]}")


def main() -> int:
    bench_tail("l2(28,128,512) ", 28, 128, 512, 1, (2, 4, 8))
    bench_tail("l3(14,256,1024)", 14, 256, 1024, 1, (8, 16))
    bench_tail("l4(7,512,2048) ", 7, 512, 2048, 1, (16, 32))
    bench_tail("l1(56,64,256)p2", 56, 64, 256, 2, (2, 4))
    bench_proj("l1_0(56,64,64,256)p2 ", 56, 64, 64, 256, 2, (2, 4))
    bench_proj("l2_0(28,128,256,512) ", 28, 128, 256, 512, 1, (4, 8))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
