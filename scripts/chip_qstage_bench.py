"""Per-stage on-chip bench: chained 2-D qstage kernel vs the XLA sequence.

Round-2's per-block kernels were bit-exact but lost e2e (custom-call
residency break + Mosaic 3-D cast relayouts).  qstage is the shape those
findings point at: the WHOLE identity run of a stage in one kernel, pure
2-D.  This measures each ResNet-50 stage's identity chain in isolation,
same-process, with an on-chip bit-exactness check first.

Usage: python scripts/chip_qstage_bench.py [B]
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
from qtpu.ops.pallas.qstage import qstage_fused, stage_coeffs
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


def _chain(key, nblk, cin, cmid):
    blocks = []
    for i in range(nblk):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        blocks.append((
            _node(ks[0], 1, 1, cin, cmid, zp=5 - i, scale=0.021 + 0.002 * i),
            _node(ks[1], 3, 3, cmid, cmid, zp=-17 + i, scale=0.013),
            _node(ks[2], 1, 1, cmid, cin, zp=9, scale=0.017 - 0.001 * i)))
    return blocks


def bench_stage(name, H, cin, cmid, nblk, ks_try):
    blocks = _chain(jax.random.fold_in(KEY, zlib.crc32(name.encode()) % 1000),
                    nblk, cin, cmid)
    ng = (jnp.float32(0.019), jnp.int32(-3))
    x = jax.random.randint(jax.random.fold_in(KEY, 77),
                           (B, H, H, cin), -128, 128, jnp.int8)

    @jax.jit
    def xla_fn(x_q):
        for i, (c1, c2, c3) in enumerate(blocks):
            tgt = (grid_of(blocks[i + 1][0])[:2] if i + 1 < len(blocks)
                   else ng)
            a = gemm_1x1(x_q, c1, relu=True, requant=grid_of(c2),
                         out_dtype=jnp.int8, use_pallas=False)
            b = conv_xla(a, c2, strides=(1, 1), relu=True,
                         requant=grid_of(c3))
            x_q = gemm_1x1(b, c3, relu=True, requant=tgt,
                           out_dtype=jnp.int8, residual=x_q,
                           res_grid=grid_of(c1), use_pallas=False)
        return x_q

    stk = dict(
        w1=jnp.stack([c1["kernel_q"].reshape(cin, cmid)
                      for c1, _, _ in blocks]),
        w2=jnp.concatenate([c2["kernel_q"].reshape(9, cmid, cmid)
                            for _, c2, _ in blocks]),
        w3=jnp.stack([c3["kernel_q"].reshape(cmid, cin)
                      for _, _, c3 in blocks]),
        **stage_coeffs(blocks, ng))

    ref = np.asarray(xla_fn(x))
    out = np.asarray(qstage_fused(x.reshape(-1, cin), h=H, w=H, **stk))
    ok = np.array_equal(ref.reshape(-1, cin), out)
    print(f"{name} bit-exact on chip: {ok}", flush=True)

    def t_xla(c):
        return xla_fn(c)
    t = time_scan_fit(t_xla, x, n_short=6, n_long=20)
    print(f"{name} xla chain : {t*1e6:8.1f} us "
          f"({t/nblk*1e6:7.1f} us/blk)", flush=True)
    for k in ks_try:
        if B % k:
            continue
        def t_k(c, k=k):
            out = qstage_fused(c.reshape(-1, cin), h=H, w=H, k=k, **stk)
            return out.reshape(c.shape)
        try:
            t = time_scan_fit(t_k, x, n_short=6, n_long=20)
            print(f"{name} qstage k={k:<3d}: {t*1e6:8.1f} us "
                  f"({t/nblk*1e6:7.1f} us/blk)", flush=True)
        except Exception as e:  # noqa: BLE001 — report per-k compile fails
            print(f"{name} qstage k={k}: FAILED {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)


def main() -> int:
    print(f"B={B}, device={jax.devices()[0]}", flush=True)
    # ResNet-50 identity-run geometries (name, H, Cin, Cmid, n identity blks)
    stages = {
        "l4": ("l4  7x7x2048", 7, 2048, 512, 2, (8, 32)),
        "l3": ("l3 14x14x1024", 14, 1024, 256, 5, (2, 8)),
        "l2": ("l2 28x28x512", 28, 512, 128, 3, (1, 2)),
        "l1": ("l1 56x56x256", 56, 256, 64, 2, (1,)),
    }
    want = sys.argv[2].split(",") if len(sys.argv) > 2 else list(stages)
    for s in want:
        bench_stage(*stages[s])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
