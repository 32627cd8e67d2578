"""On-chip stem shootout, round 2: Pallas s2d conv + bf16-MXU formulations.

Round-2 trace (qtpu.bench.tracing, B=128): stem = 981 us/step at 43% of its
own roofline — the worst-efficiency scope in the forward.  chip_stem_bench
showed XLA-side space-to-depth buys ~2% only.  This script measures the
remaining formulations, all computing bit-identical int8 codes end-to-end
(quantized conv + relu + requant + 3x3/s2 maxpool):

  v0   current engine stem (XLA int8 7x7/s2 conv + maxpool)        [baseline]
  p16  Pallas qconv2d_fused on s2d input (115,115,16), 16 static taps,
       fused requant; XLA maxpool on the int8 codes
  b16  bf16-MXU exact-integer conv: int8 codes cast to bf16 (values <= 127
       exact in bf16), conv with preferred_element_type=f32 accumulates the
       EXACT integer sum (< 2^24), epilogue identical; XLA maxpool
  b16d direct bf16 conv on (224,224,3) codes (no s2d)

bf16 rationale: v5e bf16 peak ~197 TFLOP/s; the stem is only 3e10 ops, so
ideal bf16 compute is ~153 us — if XLA's bf16 conv handles Ci=3/12 better
than its int8 conv does, it wins despite half the nominal rate.
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
from qtpu.ops.pallas.qconv import qconv2d_fused

B = int(sys.argv[1]) if len(sys.argv) > 1 else 128
KEY = jax.random.PRNGKey(0)

W7 = jax.random.randint(jax.random.fold_in(KEY, 1), (7, 7, 3, 64), -127, 128,
                        dtype=jnp.int8)
CS = jnp.sum(W7.astype(jnp.int32), axis=(0, 1, 2))
BIAS = jax.random.normal(jax.random.fold_in(KEY, 2), (64,))
WS = jnp.full((64,), 0.004)
S_IN, ZP_IN = jnp.float32(0.02), jnp.int32(-5)
S_OUT, ZP_OUT = jnp.float32(0.05), jnp.int32(-9)
XQ = jax.random.randint(jax.random.fold_in(KEY, 3), (B, 224, 224, 3),
                        -127, 128, dtype=jnp.int8)


def epilogue(acc):
    y = qops.dequant_epilogue(acc, act_scale=S_IN, act_zp=ZP_IN,
                              w_scale=WS, colsum=CS, bias=BIAS)
    y = jnp.maximum(y, 0.0)
    return qops.quantize_act(y, S_OUT, ZP_OUT, symmetric=False)


def pool(y_q):
    return jax.lax.reduce_window(y_q, jnp.int8(-128), jax.lax.max,
                                 (1, 3, 3, 1), (1, 2, 2, 1), "SAME")


@jax.jit
def v0(x_q):
    return pool(epilogue(qops.qconv2d(x_q, W7, strides=(2, 2), zp=ZP_IN)))


# ---- space-to-depth prep (factor 2, pad Ci 12->16 with zp; weights 0) -----

def s2d(x_q, pad_c=16):
    b = x_q.shape[0]
    x = x_q.reshape(b, 112, 2, 112, 2, 3)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, 112, 112, 12)
    x = jnp.pad(x, ((0, 0), (1, 2), (1, 2), (0, 0)),
                constant_values=np.int8(ZP_IN))
    if pad_c > 12:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c - 12)),
                    constant_values=np.int8(ZP_IN))
    return x


def w_s2d(pad_c=16):
    w8 = jnp.pad(W7, ((0, 1), (0, 1), (0, 0), (0, 0)))
    w = w8.reshape(4, 2, 4, 2, 3, 64).transpose(0, 2, 1, 3, 4, 5)
    w = w.reshape(4, 4, 12, 64)
    if pad_c > 12:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, pad_c - 12), (0, 0)))
    return w


W4 = w_s2d(16)


@jax.jit
def p16(x_q):
    xp = s2d(x_q, 16)
    y_q = qconv2d_fused(
        xp, W4, act_scale=S_IN, act_zp=ZP_IN, w_scale=WS, colsum=CS,
        bias=BIAS, requant_scale=S_OUT, requant_zp=ZP_OUT, relu=True,
        bb=2, out_dtype=jnp.int8)
    return pool(y_q)


# ---- bf16 exact-integer formulations --------------------------------------

@jax.jit
def b16(x_q):
    xp = s2d(x_q, 16).astype(jnp.bfloat16)
    acc = jax.lax.conv_general_dilated(
        xp, W4.astype(jnp.bfloat16), window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return pool(epilogue(acc))


@jax.jit
def b16d(x_q):
    xp = jax.lax.pad(x_q, np.int8(ZP_IN),
                     ((0, 0, 0), (2, 3, 0), (2, 3, 0), (0, 0, 0)))
    acc = jax.lax.conv_general_dilated(
        xp.astype(jnp.bfloat16), W7.astype(jnp.bfloat16),
        window_strides=(2, 2), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32).astype(jnp.int32)
    return pool(epilogue(acc))


def main() -> int:
    # p16 does not compile: Mosaic rejects the (bb,112,1792)->(rows,16)
    # shape cast ("infer-vector-layout: unsupported shape cast") — the
    # qconv static-tap kernel needs Ci % 128 == 0 for its window reshape.
    variants = [("b16", b16), ("b16d", b16d)]
    ref = np.asarray(v0(XQ[:8]))
    for name, fn in variants:
        got = np.asarray(fn(XQ[:8]))
        ok = np.array_equal(ref, got)
        print(f"{name} bit-exact vs v0: {ok}")
        if not ok:
            print(f"  mismatches {np.sum(ref != got)} / {ref.size}")
    for name, fn in [("v0", v0)] + variants:
        def body(c, fn=fn):
            out = fn(c)
            return c ^ out[0, 0, 0, 0]
        t = time_scan_fit(body, XQ, n_short=10, n_long=40)
        print(f"{name}: {t*1e6:8.1f} us/step @ B={B}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
