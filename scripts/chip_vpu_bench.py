"""Calibrate the v5e VPU: f32 elementwise op throughput + epilogue cost.

The round-2 trace shows every engine fusion pinned at 50-60% of its
max(compute, HBM) roofline with the MXU at 16-38% — the leading hypothesis
is the f32 epilogue chain on the VPU.  Folding the chain (qops.epilogue_coeffs)
bought only ~5-11%, so this measures the actual VPU rates to find the floor:

  raw    N fused multiply-adds on one f32 array (HBM amortized over N ops)
         -> ops/sec for pure VPU f32 work
  conv   int8->f32 and f32->int8 conversion chains (suspected expensive)
  epi    the exact folded epilogue (int32 acc -> int8 codes, with residual)
         at layer2-project size, vs its pure-HBM floor

Slope-fit timing within one process (tunnel rules).
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import functools

import jax
import jax.numpy as jnp

from qtpu.bench.timing import time_scan_fit

M = 12544 * 8           # rows (= B=128 of 28x28 /8... just big)
N = 512
ELEMS = M * N           # 51.4M elements, matches layer2 conv3 output
KEY = jax.random.PRNGKey(0)
ACC = jax.random.randint(KEY, (M, N), -200000, 200000, dtype=jnp.int32)
R8 = jax.random.randint(jax.random.fold_in(KEY, 1), (M, N), -128, 128,
                        dtype=jnp.int8)
XF = ACC.astype(jnp.float32) * 1e-3
A = jax.random.uniform(jax.random.fold_in(KEY, 2), (N,), jnp.float32, .5, 2.)
B = jax.random.uniform(jax.random.fold_in(KEY, 3), (N,), jnp.float32, -1, 1)


def bench(name, fn, carry, n_ops_per_elem, elems=ELEMS):
    t = time_scan_fit(fn, carry, n_short=10, n_long=30)
    rate = n_ops_per_elem * elems / t
    print(f"{name:<28} {t*1e6:9.1f} us  ->  {rate/1e12:6.2f} T op/s "
          f"({n_ops_per_elem} ops/elem)")
    return t


@jax.jit
def fma20(x):
    y = x
    for _ in range(20):
        y = y * A + B
    return y


@jax.jit
def fma1(x):
    return x * A + B


@jax.jit
def casts(x8):
    # int8 -> f32 -> round -> int8, 4 nominal ops
    y = x8.astype(jnp.float32) * A + B
    return jnp.clip(jnp.round(y), -127., 127.).astype(jnp.int8)


@jax.jit
def epilogue(acc, r8):
    t = acc.astype(jnp.float32) * A + B
    t = t + r8.astype(jnp.float32) * jnp.float32(0.37)
    q = jnp.clip(jnp.round(t), 7.0, 255.0) - 128.0
    return q.astype(jnp.int8)


def main() -> int:
    # pure f32 FMA chain: 20 fused FMAs over one 206MB round trip
    bench("fma x20 (fused)", lambda x: fma20(x), XF, 20)
    # single FMA: pure HBM round trip 206+206MB -> floor ~503us
    bench("fma x1 (HBM-bound)", lambda x: fma1(x), XF, 1)
    # conversion chain on int8
    bench("int8->f32->fma->rnd->int8",
          lambda x: casts(x) ^ jnp.int8(1), R8, 4)
    # the exact folded epilogue: int32 in (206MB), int8 res in (51MB),
    # int8 out (51MB) -> HBM floor ~375us
    def epi(c):
        out = epilogue(ACC, c)
        return c ^ out
    bench("folded epilogue (w/ res)", epi, R8, 9)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
