"""On-chip: XLA-native dual GEMM for projection tails (no custom calls).

Round-2 finding: Pallas custom calls break XLA-TPU's scoped-VMEM activation
residency — even a 2x-faster kernel is a net e2e loss.  So the projection
round trip (down branch materialized in f32 HBM) must be fixed INSIDE XLA:

  v0  current path: down GEMM -> f32 (M,Cout) HBM -> conv3 GEMM + residual
  v1  concat dual:  xcat = concat([b, x_d], C) ; wcat = [[w3],[wd]] BLOCK
      layout (2*Cout outputs); one int8 GEMM; epilogue adds the two aligned
      Cout slices with separate folded scales, relu+requant merged.
      2x the MACs (block-diagonal zeros) but no f32 intermediate, and XLA
      keeps it one fusion chain.

Checked bit-close (codes may differ at fp ties vs v0 - different formula
order), then slope-fit timed per projection shape.
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
from qtpu.ops import qops
from qtpu.serve.fused_ops import gemm_1x1

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KEY = jax.random.PRNGKey(7)


def _node(key, ci, co, *, zp, scale):
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (1, 1, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(scale),
        "act_zp": jnp.int32(zp),
    }


def bench(tag, H, cmid, cin, cout):
    ks = jax.random.split(jax.random.fold_in(KEY, zlib.crc32(tag.encode()) % 997), 4)
    c3 = _node(ks[0], cmid, cout, zp=9, scale=0.017)
    dn = _node(ks[1], cin, cout, zp=-4, scale=0.023)
    ng = (jnp.float32(0.019), jnp.int32(-3))
    b = jax.random.randint(ks[2], (B, H, H, cmid), -128, 128, jnp.int8)
    xd = jax.random.randint(ks[3], (B, H, H, cin), -128, 128, jnp.int8)

    @jax.jit
    def v0(b, xd):
        res = gemm_1x1(xd, dn, relu=False, requant=None,
                       out_dtype=jnp.float32, use_pallas=False)
        return gemm_1x1(b, c3, relu=True, requant=ng, out_dtype=jnp.int8,
                        residual=res, res_grid=None, use_pallas=False)

    # block-layout concat weights: columns [w3 | wd], rows [b-part; xd-part]
    w3 = c3["kernel_q"].reshape(cmid, cout)
    wd = dn["kernel_q"].reshape(cin, cout)
    wcat = jnp.zeros((cmid + cin, 2 * cout), jnp.int8)
    wcat = wcat.at[:cmid, :cout].set(w3)
    wcat = wcat.at[cmid:, cout:].set(wd)
    co3, _ = qops.epilogue_coeffs(
        act_scale=c3["act_scale"], act_zp=c3["act_zp"],
        w_scale=c3["w_scale"], colsum=c3["colsum"], bias=c3["bias"],
        requant_scale=ng[0], requant_zp=ng[1], relu=True, res_f32=True)
    cod, _ = qops.epilogue_coeffs(
        act_scale=dn["act_scale"], act_zp=dn["act_zp"],
        w_scale=dn["w_scale"], colsum=dn["colsum"], bias=dn["bias"])

    @jax.jit
    def v1(b, xd):
        xcat = jnp.concatenate([b, xd], axis=-1)
        acc = qops.qconv2d(xcat, wcat.reshape(1, 1, cmid + cin, 2 * cout))
        a3 = acc[..., :cout]
        ad = acc[..., cout:]
        td = ad.astype(jnp.float32) * cod.A + cod.B
        t = a3.astype(jnp.float32) * co3.A + co3.B + td * co3.C
        q = jnp.clip(jnp.round(t), co3.lo, 255.0) - 128.0
        return q.astype(jnp.int8)

    y0 = np.asarray(v0(b[:8], xd[:8]))
    y1 = np.asarray(v1(b[:8], xd[:8]))
    diff = np.abs(y0.astype(np.int32) - y1.astype(np.int32))
    print(f"{tag} v1 vs v0: mismatches {np.sum(diff > 0)}/{y0.size} "
          f"(max {diff.max()})", flush=True)
    for name, fn in [("v0", v0), ("v1", v1)]:
        def body(c, fn=fn):
            return c ^ fn(c, xd)[:, :, :, :cmid]
        t = time_scan_fit(body, b, n_short=6, n_long=20)
        print(f"{tag} {name}: {t*1e6:8.1f} us", flush=True)


def main() -> int:
    bench("l1_0(56,64,64,256)  ", 56, 64, 64, 256)
    bench("l2_0(28,128,256,512)", 28, 128, 256, 512)
    bench("l3_0(14,256,512,1024)", 14, 256, 512, 1024)
    bench("l4_0(7,512,1024,2048)", 7, 512, 1024, 2048)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
