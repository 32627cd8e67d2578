"""Unit tests for qtpu.ops.fakequant (SURVEY.md §4.2 unit-test contract)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.ops import fakequant as fq


class TestGrids:
    def test_qrange_int8_symmetric(self):
        assert fq.qrange(8, signed=True, symmetric=True) == (-127, 127)

    def test_qrange_int8_affine_signed(self):
        assert fq.qrange(8, signed=True, symmetric=False) == (-128, 127)

    def test_qrange_uint8(self):
        assert fq.qrange(8, signed=False) == (0, 255)

    def test_qrange_int4(self):
        assert fq.qrange(4, signed=True, symmetric=True) == (-7, 7)


class TestFakeQuant:
    def test_idempotent(self):
        """fake_quant(fake_quant(x)) == fake_quant(x): grid points are fixed."""
        x = jax.random.normal(jax.random.PRNGKey(0), (64, 32))
        s = fq.symmetric_scale(jnp.max(jnp.abs(x)), 8)
        y1 = fq.fake_quant(x, s)
        y2 = fq.fake_quant(y1, s)
        np.testing.assert_allclose(y1, y2, atol=1e-6)

    def test_quantization_error_bound(self):
        """|x - q(x)| <= scale/2 inside the clip range."""
        x = jax.random.normal(jax.random.PRNGKey(1), (128,))
        amax = jnp.max(jnp.abs(x))
        s = fq.symmetric_scale(amax, 8)
        y = fq.fake_quant(x, s)
        assert jnp.max(jnp.abs(x - y)) <= float(s) / 2 + 1e-7

    def test_int4_coarser_than_int8(self):
        x = jax.random.normal(jax.random.PRNGKey(2), (256,))
        e8 = jnp.mean((x - fq.fake_quant_weight(x, bits=8)) ** 2)
        e4 = jnp.mean((x - fq.fake_quant_weight(x, bits=4)) ** 2)
        assert float(e4) > float(e8)

    def test_per_channel_beats_per_tensor(self):
        """Channels with very different ranges: per-channel MSE must be lower."""
        k = jax.random.PRNGKey(3)
        w = jax.random.normal(k, (8, 3, 3, 16)) * jnp.logspace(-2, 1, 16)
        e_pt = jnp.mean((w - fq.fake_quant_weight(w, bits=8)) ** 2)
        e_pc = jnp.mean((w - fq.fake_quant_weight(w, bits=8, channel_axis=3)) ** 2)
        assert float(e_pc) < float(e_pt)

    def test_zero_maps_to_zero_symmetric(self):
        x = jnp.array([0.0, 0.5, -0.5])
        y = fq.fake_quant(x, jnp.float32(0.1))
        assert float(y[0]) == 0.0

    def test_zero_exactly_representable_affine(self):
        """Affine qparams must represent 0 exactly (ReLU/padding correctness)."""
        s, zp = fq.affine_qparams(jnp.float32(0.3), jnp.float32(5.7), 8)
        x = jnp.zeros(4)
        y = fq.fake_quant(x, s, zp, signed=False, symmetric=False)
        np.testing.assert_allclose(y, 0.0, atol=1e-7)

    def test_affine_covers_range(self):
        xmin, xmax = -1.3, 2.7
        s, zp = fq.affine_qparams(jnp.float32(xmin), jnp.float32(xmax), 8)
        x = jnp.linspace(xmin, xmax, 100)
        y = fq.fake_quant(x, s, zp, signed=False, symmetric=False)
        assert jnp.max(jnp.abs(x - y)) <= float(s) / 2 + 1e-6


class TestSTE:
    def test_passthrough_grad_is_identity(self):
        x = jax.random.normal(jax.random.PRNGKey(4), (32,))
        s = jnp.float32(0.05)
        g = jax.grad(lambda v: jnp.sum(fq.fake_quant(v, s)))(x)
        np.testing.assert_allclose(g, jnp.ones_like(x), atol=1e-7)

    def test_clip_ste_zero_outside(self):
        s = jnp.float32(0.01)  # grid covers [-1.27, 1.27]
        x = jnp.array([-5.0, 0.3, 5.0])
        g = jax.grad(lambda v: jnp.sum(fq.fake_quant(v, s, ste="clip")))(x)
        np.testing.assert_allclose(g, jnp.array([0.0, 1.0, 0.0]), atol=1e-7)

    def test_no_grad_to_scale(self):
        x = jax.random.normal(jax.random.PRNGKey(5), (16,))
        g = jax.grad(lambda s: jnp.sum(fq.fake_quant(x, s)))(jnp.float32(0.1))
        assert float(g) == 0.0

    def test_weight_fake_quant_grad_identity(self):
        w = jax.random.normal(jax.random.PRNGKey(6), (4, 4))
        g = jax.grad(lambda v: jnp.sum(fq.fake_quant_weight(v)))(w)
        np.testing.assert_allclose(g, jnp.ones_like(w), atol=1e-7)


class TestRealQuant:
    def test_quantize_dequantize_roundtrip(self):
        x = jax.random.normal(jax.random.PRNGKey(7), (64,))
        s = fq.symmetric_scale(jnp.max(jnp.abs(x)), 8)
        q = fq.quantize(x, s)
        assert q.dtype == jnp.int8
        y = fq.dequantize(q, s)
        np.testing.assert_allclose(y, fq.fake_quant(x, s), atol=1e-6)

    def test_quantize_matches_fake_quant_grid(self):
        """Integer path and simulation path must agree exactly on the grid."""
        x = jax.random.normal(jax.random.PRNGKey(8), (128,)) * 3
        s = fq.symmetric_scale(jnp.max(jnp.abs(x)), 4)
        q = fq.quantize(x, s, bits=4)
        assert int(jnp.max(q)) <= 7 and int(jnp.min(q)) >= -7
        np.testing.assert_allclose(fq.dequantize(q, s),
                                   fq.fake_quant(x, s, bits=4), atol=1e-6)


class TestInt4Packing:
    def test_pack_unpack_roundtrip(self):
        k = jax.random.PRNGKey(9)
        q = jax.random.randint(k, (6, 8), -7, 8, dtype=jnp.int8)
        for axis in (0, 1, -1):
            packed = fq.pack_int4(q, axis=axis)
            assert packed.shape[axis % 2] == q.shape[axis % 2] // 2 or axis % 2 != (axis % q.ndim)
            out = fq.unpack_int4(packed, axis=axis)
            np.testing.assert_array_equal(out, q)

    def test_packed_size_halved(self):
        q = jnp.zeros((4, 16), jnp.int8)
        assert fq.pack_int4(q, axis=1).shape == (4, 8)

    def test_odd_axis_raises(self):
        with pytest.raises(ValueError):
            fq.pack_int4(jnp.zeros((3, 5), jnp.int8), axis=1)

    def test_negative_values_sign_extend(self):
        q = jnp.array([[-7, 7, -1, 1]], dtype=jnp.int8)
        np.testing.assert_array_equal(fq.unpack_int4(fq.pack_int4(q)), q)
