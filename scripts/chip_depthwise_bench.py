"""On-chip depthwise int8 kernel bench: lane-aligned channels vs round 1.

Round 1: qdepthwise at 74 GB/s effective vs XLA's 162 on 112²×96.  The
relayout hypothesis (per-tap window slice at lane offset kw·C only aligned
when C % 128 == 0) was tested via the p_pad variant — and REFUTED:

  MEASURED 2026-08-18 (B=32, one process):
    112²x96 : xla 261us (295 GB/s) | p_raw 1065us (72) | p_pad 1613us (48)
    56²x144 : xla  83us (349 GB/s) | p_raw  617us (47) | p_pad  686us (42)
    28²x384 : p_raw 408us (47)     | p_pad 308us (63)

  Channel-padding to 128 multiples makes the big shapes WORSE (+33% data
  dominates), so the kernel's loss is in the int32 broadcast-multiply
  accumulation itself, not the tap slices.  XLA's grouped int8 conv is
  3-7x faster than any variant and stays the engine dispatch — final,
  consistent with the round-2 rule that custom calls also break scoped-VMEM
  residency around themselves.  (p_pad additionally showed a coefficient-
  padding exactness subtlety on affine grids — not worth chasing given the
  perf verdict; p_raw, the shipped kernel, is bit-exact everywhere.)

Variants:

  xla     qops.qconv2d(groups=C) + folded epilogue            [dispatch today]
  p_raw   qdepthwise_fused at native C                        [round-1 form]
  p_pad   channels zp-padded to the next 128 multiple XLA-side (weights/
          coeff rows zero-padded), kernel runs lane-aligned, output sliced

All bit-exact vs the XLA oracle before timing.  Effective GB/s = (in+out
int8 bytes at native C) / time.
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import time_scan_fit
from qtpu.ops import qops
from qtpu.ops.pallas.qconv import pad_for_conv
from qtpu.ops.pallas.qdepthwise import qdepthwise_fused

B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
KEY = jax.random.PRNGKey(9)


def bench(H, C):
    ks = jax.random.split(jax.random.fold_in(KEY, C), 4)
    xq = jax.random.randint(ks[0], (B, H, H, C), -127, 128, dtype=jnp.int8)
    wq = jax.random.randint(ks[1], (3, 3, 1, C), -127, 128, dtype=jnp.int8)
    ws = jax.random.uniform(ks[2], (C,), jnp.float32, 0.001, 0.01)
    cs = jnp.sum(wq.astype(jnp.int32), axis=(0, 1, 2))
    b = jax.random.normal(ks[3], (C,))
    zp = jnp.int32(3)
    rs, rz = jnp.float32(0.05), jnp.int32(-3)
    kw = dict(act_scale=jnp.float32(0.02), act_zp=zp, w_scale=ws, colsum=cs,
              bias=b, requant_scale=rs, requant_zp=rz, relu=True)

    @jax.jit
    def xla_fn(xq):
        acc = qops.qconv2d(xq, wq, groups=C, zp=zp)
        co, mode = qops.epilogue_coeffs(**kw)
        return qops.apply_epilogue(acc, co, mode, out_dtype=jnp.int8)

    @jax.jit
    def p_raw(xq):
        xp = pad_for_conv(xq, (3, 3), zp)
        return qdepthwise_fused(xp, wq, **kw, bb=2, out_dtype=jnp.int8)

    Cp = -(-C // 128) * 128

    @jax.jit
    def p_pad(xq):
        xp = pad_for_conv(xq, (3, 3), zp)
        xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, Cp - C)),
                     constant_values=np.int8(0))
        wp = jnp.pad(wq, ((0, 0), (0, 0), (0, 0), (0, Cp - C)))
        kwp = dict(kw, w_scale=jnp.pad(ws, (0, Cp - C), constant_values=1.0),
                   colsum=jnp.pad(cs, (0, Cp - C)),
                   bias=jnp.pad(b, (0, Cp - C)))
        y = qdepthwise_fused(xp, wp, **kwp, bb=2, out_dtype=jnp.int8)
        return y[..., :C]

    ref = np.asarray(xla_fn(xq[:4]))
    for name, fn in [("p_raw", p_raw), ("p_pad", p_pad)]:
        got = np.asarray(fn(xq[:4]))
        ok = np.array_equal(ref, got)
        print(f"dw {H}x{H}x{C} {name} bit-exact: {ok}", flush=True)
    bytes_io = 2 * B * H * H * C
    for name, fn in [("xla  ", xla_fn), ("p_raw", p_raw), ("p_pad", p_pad)]:
        def body(c, fn=fn):
            return c ^ fn(c)
        t = time_scan_fit(body, xq, n_short=8, n_long=30)
        print(f"dw {H}x{H}x{C} {name}: {t*1e6:8.1f} us  "
              f"({bytes_io/t/1e9:6.1f} GB/s eff)", flush=True)


def main() -> int:
    bench(112, 96)
    bench(56, 144)
    bench(28, 384)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
