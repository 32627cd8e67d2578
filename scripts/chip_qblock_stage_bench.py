"""Per-stage on-chip bench: qbottleneck_fused vs the 3-op XLA sequence.

One process, slope-fit timing, all four ResNet-50 identity-bottleneck shapes.
Also reports the HBM-traffic roofline time for each (the fusion target).
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.ops.pallas.qblock import block_scalars, qbottleneck_fused
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of
from qtpu.serve.resnet_engine import _qblock_bb

KEY = jax.random.PRNGKey(3)


def node(key, kh, kw, ci, co):
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (kh, kw, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(0.017),
        "act_zp": jnp.int32(3),
    }


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    print("platform:", jax.devices()[0].platform, " B =", B, flush=True)
    row = lambda v: jnp.asarray(v).reshape(1, -1)
    # (H, Cin, Cmid) for ResNet-50 stages 1-4 identity blocks
    stages = [(56, 256, 64), (28, 512, 128), (14, 1024, 256), (7, 2048, 512)]
    for H, cin, cmid in stages:
        ks = jax.random.split(jax.random.fold_in(KEY, H), 4)
        c1, c2, c3 = (node(ks[0], 1, 1, cin, cmid),
                      node(ks[1], 3, 3, cmid, cmid),
                      node(ks[2], 1, 1, cmid, cin))
        next_grid = (jnp.float32(0.019), jnp.int32(-3))
        x_q = jax.random.randint(ks[3], (B, H, H, cin), -128, 128, jnp.int8)
        pair = 1 if cmid % 128 == 0 else 2
        bb = _qblock_bb(B, H, H)

        kwargs = dict(
            w1=c1["kernel_q"].reshape(cin, cmid),
            w2=c2["kernel_q"].reshape(9, cmid, cmid),
            w3=c3["kernel_q"].reshape(cmid, cin),
            scalars=block_scalars(c1, c2, c3, next_grid),
            ws1=row(c1["w_scale"]), cs1=row(c1["colsum"]),
            b1=row(c1["bias"]),
            ws2=row(c2["w_scale"]), cs2=row(c2["colsum"]),
            b2=row(c2["bias"]),
            ws3=row(c3["w_scale"]), cs3=row(c3["colsum"]),
            b3=row(c3["bias"]), bb=bb, pair=pair)

        @jax.jit
        def seq(xq, c1=c1, c2=c2, c3=c3, ng=next_grid):
            a = gemm_1x1(xq, c1, relu=True, requant=grid_of(c2),
                         out_dtype=jnp.int8, use_pallas=False)
            b = conv_xla(a, c2, strides=(1, 1), relu=True,
                         requant=grid_of(c3))
            return gemm_1x1(b, c3, relu=True, requant=ng, out_dtype=jnp.int8,
                            residual=xq, res_grid=grid_of(c1),
                            use_pallas=False)

        fused = functools.partial(qbottleneck_fused, **kwargs)

        # parity on chip
        y_seq = np.asarray(jax.device_get(seq(x_q)))
        y_fus = np.asarray(jax.device_get(fused(x_q)))
        mism = int(np.sum(y_seq != y_fus))

        # the block maps int8 (B,H,W,Cin) -> same shape: chain outputs
        # directly so nothing can be dead-code-eliminated.
        dt_seq = time_scan_fit(seq, x_q, n_short=5, n_long=20)
        dt_fus = time_scan_fit(fused, x_q, n_short=5, n_long=20)
        # MACs (unpaired): conv1 + conv2 + conv3
        macs = B * H * H * (cin * cmid + 9 * cmid * cmid + cmid * cin)
        # minimal HBM traffic for the fused op: read x, read w, write out
        traffic = (2 * B * H * H * cin
                   + cin * cmid * 2 + 9 * cmid * cmid)
        print(f"H={H:3d} Cin={cin:4d} Cmid={cmid:3d} pair={pair} bb={bb:2d} "
              f"| mism {mism:9d}/{y_seq.size:9d} "
              f"| seq {dt_seq*1e3:7.3f} ms ({2*macs/dt_seq/1e12:5.1f} TOPS) "
              f"| fused {dt_fus*1e3:7.3f} ms ({2*macs/dt_fus/1e12:5.1f} TOPS)"
              f" | min-traffic {traffic/819e9*1e3:6.3f} ms", flush=True)


if __name__ == "__main__":
    main()
