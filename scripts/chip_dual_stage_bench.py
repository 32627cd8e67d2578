"""Per-shape on-chip bench: qmatmul_dual vs the XLA separate-conv pair.

Isolates where the dual kernel wins/loses per ResNet-50 projection block,
including the NHWC->(M,C) reshape and the strided downsample slice both
paths pay.  One process, slope-fit timing.
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.ops.pallas.qmatmul_dual import qmatmul_dual
from qtpu.serve.fused_ops import best_tile, gemm_1x1, lane_tile

KEY = jax.random.PRNGKey(5)


def node(key, ci, co):
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (1, 1, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(0.017),
        "act_zp": jnp.int32(3),
        "act_sym": jnp.asarray(False),
    }


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
    print("platform:", jax.devices()[0].platform, " B =", B, flush=True)
    # (H_out, Cmid, Cin_down_pre_slice, Cout, stride)
    shapes = [(56, 64, 64, 256, 1),
              (28, 128, 256, 512, 2),
              (14, 256, 512, 1024, 2),
              (7, 512, 1024, 2048, 2)]
    if len(sys.argv) > 2:            # optional stage filter: 56/28/14/7
        shapes = [s for s in shapes if s[0] == int(sys.argv[2])]
    ng = (jnp.float32(0.02), jnp.int32(-4))
    for H, cmid, cin, cout, s in shapes:
        ks = jax.random.split(jax.random.fold_in(KEY, H), 4)
        c3 = node(ks[0], cmid, cout)
        dn = node(ks[1], cin, cout)
        b_in = jax.random.randint(ks[2], (B, H, H, cmid), -127, 128, jnp.int8)
        x_in = jax.random.randint(ks[3], (B, H * s, H * s, cin),
                                  -127, 128, jnp.int8)

        @jax.jit
        def xla_pair(b, x, c3=c3, dn=dn, s=s):
            res = gemm_1x1(x[:, ::s, ::s, :], dn, relu=False, requant=None,
                           out_dtype=jnp.float32, use_pallas=False)
            return gemm_1x1(b, c3, relu=True, requant=ng,
                            out_dtype=jnp.int8, residual=res, res_grid=None,
                            use_pallas=False)

        @jax.jit
        def dual(b, x, c3=c3, dn=dn, s=s, cout=cout):
            bb, hh = b.shape[0], b.shape[1]
            M = bb * hh * hh
            x_d = x[:, ::s, ::s, :]
            y = qmatmul_dual(
                b.reshape(M, b.shape[-1]),
                c3["kernel_q"].reshape(-1, cout),
                x_d.reshape(M, x.shape[-1]),
                dn["kernel_q"].reshape(-1, cout),
                act_scale1=c3["act_scale"], act_zp1=c3["act_zp"],
                w_scale1=c3["w_scale"], colsum1=c3["colsum"],
                bias1=c3["bias"],
                act_scale2=dn["act_scale"], act_zp2=dn["act_zp"],
                w_scale2=dn["w_scale"], colsum2=dn["colsum"],
                bias2=dn["bias"],
                requant_scale=ng[0], requant_zp=ng[1],
                relu=True, bm=best_tile(M), bn=lane_tile(cout))
            return y.reshape(bb, hh, hh, cout)

        ya = np.asarray(xla_pair(b_in, x_in))
        yb = np.asarray(dual(b_in, x_in))
        mism = int(np.sum(ya != yb))

        def time_fn(fn):
            def body(c, fn=fn):
                out = fn(c, x_in)
                return c ^ out[0, 0, 0, 0]
            return time_scan_fit(body, b_in, n_short=10, n_long=40)

        ta, tb = time_fn(xla_pair), time_fn(dual)
        M = B * H * H
        traffic = M * (cmid + cin + cout)  # int8 min bytes
        print(f"H={H:3d} Cmid={cmid:4d} Cin={cin:4d} Cout={cout:4d} "
              f"| mism {mism:8d}/{ya.size:9d} "
              f"| xla {ta*1e6:7.1f} us | dual {tb*1e6:7.1f} us "
              f"| min-traffic {traffic/819e9*1e6:6.1f} us", flush=True)


if __name__ == "__main__":
    main()
