"""On-chip microbench: ResNet-50 stem variants (ROADMAP #2).

The stem (quantize + 7x7/s2 int8 conv + relu + requant + 3x3/s2 maxpool) runs
at 43% of its roofline — 981 us/step at B=128, 10.7% of the forward
(qtpu.bench.tracing, 2026-08-17).  XLA's int8 conv is weak on Ci=3.

Variants (all computing the SAME integer math end-to-end from int8 codes):
  v0  current engine stem: 7x7 conv on (224,224,3) + maxpool
  v1  space-to-depth: XLA transpose to (112,112,12), 4x4 conv (zero-padded
      7x7 kernel), + maxpool
  v2  v1 with channels padded 12->16 (zp codes; zero weight rows)
  v3  v1 but s2d to (56,56,48) via factor-4 blocks + 2x2 conv? (only if
      shapes work out — factor 4 with stride 2 means output parity split;
      skipped, placeholder)

All variants are checked bit-exact against v0 before timing.  Timing is
slope-fit within one process (tunnel rules).
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

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KEY = jax.random.PRNGKey(0)

# frozen-stem-like params
W7 = jax.random.randint(jax.random.fold_in(KEY, 1), (7, 7, 3, 64), -127, 128,
                        dtype=jnp.int8)
CS = jnp.sum(W7.astype(jnp.int32), axis=(0, 1, 2))
BIAS = jax.random.normal(jax.random.fold_in(KEY, 2), (64,))
S_IN, ZP_IN = jnp.float32(0.02), jnp.int32(-5)
S_OUT, ZP_OUT = jnp.float32(0.05), jnp.int32(-9)
XQ = jax.random.randint(jax.random.fold_in(KEY, 3), (B, 224, 224, 3),
                        -127, 128, dtype=jnp.int8)


def finish(acc):
    y = qops.dequant_epilogue(acc, act_scale=S_IN, act_zp=ZP_IN,
                              w_scale=jnp.full((64,), 0.004), colsum=CS,
                              bias=BIAS)
    y = jnp.maximum(y, 0.0)
    y_q = qops.quantize_act(y, S_OUT, ZP_OUT, symmetric=False)
    return jax.lax.reduce_window(y_q, jnp.int8(-128), jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "SAME")


@jax.jit
def v0(x_q):
    return finish(qops.qconv2d(x_q, W7, strides=(2, 2), zp=ZP_IN))


def s2d(x_q):
    """(B,224,224,3) int8 -> zp-padded (B,115,115,12), cells (dy,dx,ci)."""
    b = x_q.shape[0]
    x = x_q.reshape(b, 112, 2, 112, 2, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 112, 112, 12)
    return jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)),
                   constant_values=np.int8(ZP_IN))


def w_s2d(pad_c: int = 12):
    """zero-pad 7x7 to 8x8 and fold into a 4x4 x pad_c kernel."""
    w8 = jnp.pad(W7, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    w = w.reshape(4, 4, 12, 64)
    if pad_c > 12:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c - 12), (0, 0)))
    return w


W4 = w_s2d(12)
W4_16 = w_s2d(16)


@jax.jit
def v1(x_q):
    xp = s2d(x_q)
    acc = qops.qconv2d(xp, W4, strides=(1, 1), padding=((0, 0), (0, 0)))
    return finish(acc)


@jax.jit
def v2(x_q):
    xp = s2d(x_q)
    xp = jnp.pad(xp, ((0, 0), (0, 0), (0, 0), (0, 4)),
                 constant_values=np.int8(ZP_IN))
    acc = qops.qconv2d(xp, W4_16, strides=(1, 1), padding=((0, 0), (0, 0)))
    return finish(acc)


def main() -> int:
    ref = np.asarray(v0(XQ[:8]))
    for name, fn in [("v1", v1), ("v2", v2)]:
        got = np.asarray(fn(XQ[:8]))
        ok = np.array_equal(ref, got)
        print(f"{name} bit-exact vs v0: {ok}")
        if not ok:
            print(f"  mismatch count {np.sum(ref != got)} of {ref.size}")
    for name, fn in [("v0", v0), ("v1", v1), ("v2", v2)]:
        def body(c, fn=fn):
            out = fn(c)
            # XOR a data-dependent scalar into the carry: scan iterations
            # stay dependent (no elision) at equal ~19MB carry-write cost
            # across variants.
            return c ^ out[0, 0, 0, 0]
        t = time_scan_fit(body, XQ, n_short=10, n_long=40)
        print(f"{name}: {t*1e6:8.1f} us/step @ B={B}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
