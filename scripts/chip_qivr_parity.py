"""On-chip parity sweep for qivr_fused: isolate which geometries miscompute.

chip_qivr_bench found runs with E=192 and E=576 NOT bit-exact on hardware
while interpret mode (CPU) is exact for all — a Mosaic lowering issue or a
kernel assumption broken on hw.  This sweeps (H, E, nrun, k) on small
random cases and prints exact/INEXACT per combo to localize the trigger.

Usage: python scripts/chip_qivr_parity.py
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.ops.pallas.qivr import ivr_coeffs, qivr_fused
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of

KEY = jax.random.PRNGKey(3)


def _node(key, kh, kw, ci, co, *, zp, scale, dw=False):
    k1, k2, k3 = jax.random.split(key, 3)
    shape = (kh, kw, 1, co) if dw else (kh, kw, ci, co)
    w_q = jax.random.randint(k1, shape, -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(scale),
        "act_zp": jnp.int32(zp),
    }


def _blocks(key, nblk, c, e):
    out = []
    for i in range(nblk):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        c1 = _node(ks[0], 1, 1, c, e, zp=4 - i, scale=0.02 + 0.001 * i)
        c2 = _node(ks[1], 3, 3, e, e, zp=-9 + i, scale=0.014, dw=True)
        c3 = _node(ks[2], 1, 1, e, c, zp=6, scale=0.016)
        out.append((c1, c2, c3))
    return out


def _stack(blocks, c, e):
    return dict(
        w1=jnp.stack([c1["kernel_q"].reshape(c, e) for c1, _, _ in blocks]),
        wd=jnp.concatenate([c2["kernel_q"].reshape(9, e)
                            for _, c2, _ in blocks]),
        w3=jnp.stack([c3["kernel_q"].reshape(e, c) for _, _, c3 in blocks]))


def _ref(x_q, blocks, next_grid):
    for i, (c1, c2, c3) in enumerate(blocks):
        tgt = (grid_of(blocks[i + 1][0])[:2] if i + 1 < len(blocks)
               else next_grid)
        a = gemm_1x1(x_q, c1, relu=True, act_max=6.0, requant=grid_of(c2),
                     out_dtype=jnp.int8, use_pallas=False)
        b = conv_xla(a, c2, strides=(1, 1), groups=a.shape[-1], relu=True,
                     act_max=6.0, requant=grid_of(c3))
        x_q = gemm_1x1(b, c3, relu=False, requant=tgt, out_dtype=jnp.int8,
                       residual=x_q, res_grid=grid_of(c1), use_pallas=False)
    return x_q


def main() -> int:
    next_grid = (jnp.float32(0.018), jnp.int32(-2))
    cases = []
    for e in (128, 144, 160, 192, 256, 384, 576):
        cases.append((14, 32, e, 1, 0))
    cases += [(28, 32, 192, 1, 0), (28, 32, 192, 2, 0),
              (14, 96, 576, 2, 0),
              (14, 32, 192, 1, 1),     # forced k=1
              (14, 32, 576, 1, 1)]
    for H, C, E, nrun, kforce in cases:
        blocks = _blocks(jax.random.fold_in(KEY, E * 7 + nrun), nrun, C, E)
        B = 8
        x = jax.random.randint(jax.random.fold_in(KEY, E + H),
                               (B, H, H, C), -128, 128, jnp.int8)
        ref = np.asarray(_ref(x, blocks, next_grid))
        out = qivr_fused(x.reshape(-1, C), **_stack(blocks, C, E),
                         **ivr_coeffs(blocks, next_grid), h=H, w=H, k=kforce)
        out = np.asarray(out).reshape(ref.shape)
        bad = int(np.sum(out != ref))
        # locate the mismatches spatially (edge rows vs interior)
        where = ""
        if bad:
            idx = np.argwhere(out != ref)
            hs = np.unique(idx[:, 1])
            ws = np.unique(idx[:, 2])
            where = f" rows={hs[:6].tolist()} cols={ws[:6].tolist()}"
        print(f"H={H:<3d} C={C:<3d} E={E:<4d} nrun={nrun} k={kforce}: "
              f"{'exact' if not bad else f'INEXACT {bad}/{ref.size}'}{where}",
              flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
