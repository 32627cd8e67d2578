"""Spatial partitioning (halo-exchange conv) vs the single-device oracle.

Integer cases must match qtpu.ops.qops.qconv2d EXACTLY (same int32
accumulators); fp32 cases match lax SAME conv to tolerance.  Runs on the
8-virtual-device CPU mesh (conftest).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import qops
from qtpu.parallel.spatial import (make_spatial_mesh, spatial_conv2d,
                                   spatial_sharding)

KEY = jax.random.PRNGKey(0)


def _int8(key, shape):
    return jax.random.randint(key, shape, -128, 128, dtype=jnp.int8)


@pytest.mark.parametrize("kh,kw,stride", [
    (3, 3, 1),   # the workhorse 3x3
    (3, 3, 2),   # stage-boundary downsample
    (1, 1, 1),   # pointwise (no halo at all)
    (7, 7, 2),   # ResNet stem geometry
])
@pytest.mark.parametrize("zp", [None, 5])
def test_spatial_qconv_exact(kh, kw, stride, zp):
    k1, k2 = jax.random.split(KEY)
    x = _int8(k1, (2, 16, 16, 8))
    w = _int8(k2, (kh, kw, 8, 16))
    zp_arr = None if zp is None else jnp.asarray(zp, jnp.int32)
    ref = qops.qconv2d(x, w, strides=(stride, stride), zp=zp_arr)

    mesh = make_spatial_mesh(sp=4, dp=2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    out = spatial_conv2d(xs, w, mesh, strides=(stride, stride), zp=zp_arr)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spatial_conv_fp32_and_chaining():
    """fp32 path vs lax SAME conv, and two chained convs stay H-sharded
    with only halo ppermutes between them (no resharding round trip)."""
    k1, k2, k3 = jax.random.split(KEY, 3)
    x = jax.random.normal(k1, (2, 32, 32, 4))
    w1 = jax.random.normal(k2, (3, 3, 4, 8)) * 0.1
    w2 = jax.random.normal(k3, (3, 3, 8, 8)) * 0.1

    ref = jax.lax.conv_general_dilated(
        x, w1, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
    ref = jax.lax.conv_general_dilated(
        ref, w2, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    mesh = make_spatial_mesh(sp=8, dp=1)
    xs = jax.device_put(x, spatial_sharding(mesh))
    y = spatial_conv2d(xs, w1, mesh)
    assert y.sharding.spec == spatial_sharding(mesh).spec
    y = spatial_conv2d(y, w2, mesh, strides=(2, 2))
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_spatial_depthwise():
    """groups=C depthwise conv through the same halo path (MobileNet)."""
    k1, k2 = jax.random.split(KEY)
    x = _int8(k1, (2, 16, 16, 8))
    w = _int8(k2, (3, 3, 1, 8))
    ref = qops.qconv2d(x, w, strides=(1, 1), groups=8)
    mesh = make_spatial_mesh(sp=4, dp=2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    out = spatial_conv2d(xs, w, mesh, groups=8)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_spatial_rejects_bad_geometry():
    mesh = make_spatial_mesh(sp=4, dp=2)
    x = jnp.zeros((1, 18, 16, 4), jnp.int8)   # 18 % 4 != 0
    w = jnp.zeros((3, 3, 4, 4), jnp.int8)
    with pytest.raises(ValueError):
        spatial_conv2d(x, w, mesh)


def test_spatial_rejects_halo_larger_than_shard():
    """A 7x7 stride-1 kernel on 2-row local shards needs 3 halo rows —
    more than one neighbor owns.  Must be a clear ValueError, not the
    opaque GSPMD assertion it used to die with inside jit."""
    mesh = make_spatial_mesh(sp=4, dp=2)
    x = jnp.zeros((1, 8, 16, 4), jnp.int8)     # local H = 2
    w = jnp.zeros((7, 7, 4, 4), jnp.int8)
    with pytest.raises(ValueError, match="halo"):
        spatial_conv2d(x, w, mesh, strides=(1, 1))


def test_spatial_max_pool_and_stem_chain():
    """Full spatially-sharded ResNet stem: 7x7/2 conv -> 3x3/2 max-pool ->
    3x3 conv, every op H-sharded end to end, vs the single-device oracle."""
    from qtpu.parallel.spatial import spatial_max_pool

    k1, k2, k3 = jax.random.split(KEY, 3)
    x = _int8(k1, (2, 64, 64, 3))
    w1 = _int8(k2, (7, 7, 3, 8))
    w2 = _int8(k3, (3, 3, 8, 8))

    def requant(acc):
        return jnp.clip(acc // 256, -128, 127).astype(jnp.int8)

    ref = requant(qops.qconv2d(x, w1, strides=(2, 2)))
    ref_pool = jax.lax.reduce_window(
        ref, jnp.asarray(-128, jnp.int8), jax.lax.max,
        (1, 3, 3, 1), (1, 2, 2, 1), ((0, 0), (0, 1), (0, 1), (0, 0)))
    ref_out = qops.qconv2d(ref_pool, w2)

    mesh = make_spatial_mesh(sp=4, dp=2)
    xs = jax.device_put(x, spatial_sharding(mesh))
    y = requant(spatial_conv2d(xs, w1, mesh, strides=(2, 2)))
    y = spatial_max_pool(y, mesh)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref_pool))
    y = spatial_conv2d(y, w2, mesh)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref_out))


def test_spatial_max_pool_fp32():
    from qtpu.parallel.spatial import spatial_max_pool

    x = jax.random.normal(KEY, (2, 32, 32, 4))
    ref = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        ((0, 0), (0, 1), (0, 1), (0, 0)))
    mesh = make_spatial_mesh(sp=8, dp=1)
    y = spatial_max_pool(jax.device_put(x, spatial_sharding(mesh)), mesh)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(ref))
