"""Calibrator tests: minmax/EMA observers, histogram, KL vs scipy oracle."""
import jax
import jax.numpy as jnp
import numpy as np
import scipy.stats

from qtpu.calib import kl as qkl
from qtpu.calib import observers as obs
from qtpu.ops import fakequant as fq


class TestMinMax:
    def test_tracks_global_extremes(self):
        s = obs.minmax_init()
        batches = [jnp.array([-1.0, 2.0]), jnp.array([0.5, 3.0]), jnp.array([-4.0, 1.0])]
        for b in batches:
            s = obs.minmax_update(s, b)
        assert float(s["min"]) == -4.0 and float(s["max"]) == 3.0
        assert int(s["count"]) == 3

    def test_first_batch_initializes(self):
        s = obs.minmax_update(obs.minmax_init(), jnp.array([5.0, 7.0]))
        assert float(s["min"]) == 5.0  # not clamped to the zero init

    def test_jit_compatible(self):
        upd = jax.jit(obs.minmax_update)
        s = obs.minmax_init()
        s = upd(s, jnp.arange(10.0))
        assert float(s["max"]) == 9.0


class TestEMA:
    def test_converges_to_stationary_stats(self):
        key = jax.random.PRNGKey(0)
        s = obs.ema_init()
        for i in range(200):
            x = jax.random.normal(jax.random.fold_in(key, i), (512,))
            s = obs.ema_update(s, x, momentum=0.9)
        # stationary N(0,1): batch max of 512 samples ~ 3.1-3.5
        assert 2.5 < float(s["max"]) < 4.5
        assert -4.5 < float(s["min"]) < -2.5

    def test_momentum_smooths_outlier(self):
        s = obs.ema_update(obs.ema_init(), jnp.array([-1.0, 1.0]))
        s = obs.ema_update(s, jnp.array([-100.0, 100.0]), momentum=0.99)
        assert float(s["max"]) < 3.0  # outlier contributes only 1%


class TestHistogram:
    def test_counts_sum_to_n(self):
        s = obs.hist_set_range(obs.hist_init(64), jnp.float32(1.0))
        x = jnp.linspace(-1, 1, 1000)
        s = obs.hist_update(s, x)
        assert float(jnp.sum(s["counts"])) == 1000.0

    def test_overflow_clamps_to_last_bin(self):
        s = obs.hist_set_range(obs.hist_init(16), jnp.float32(1.0))
        s = obs.hist_update(s, jnp.array([10.0, -20.0]))
        assert float(s["counts"][-1]) == 2.0

    def test_uniform_distribution_flat(self):
        s = obs.hist_set_range(obs.hist_init(8), jnp.float32(1.0))
        x = jnp.linspace(0.001, 0.999, 8000)
        s = obs.hist_update(s, x)
        np.testing.assert_allclose(np.asarray(s["counts"]), 1000.0, rtol=0.01)


class TestKL:
    def _hist(self, x, nbins=2048):
        ax = np.abs(np.asarray(x))
        amax = float(ax.max())
        counts, _ = np.histogram(ax, bins=nbins, range=(0.0, amax))
        return counts.astype(np.float64), amax

    def test_kl_matches_scipy_entropy(self):
        """Our _kl_divergence == scipy.stats.entropy on valid dists."""
        rng = np.random.default_rng(0)
        p = rng.random(100)
        q = rng.random(100) + 0.1
        ours = qkl._kl_divergence(p, q)
        ref = scipy.stats.entropy(p / p.sum(), q / q.sum())
        np.testing.assert_allclose(ours, ref, rtol=1e-10)

    def test_gaussian_threshold_keeps_mass(self):
        """Gaussian (no outliers): threshold stays in (q95, amax]."""
        rng = np.random.default_rng(1)
        x = rng.standard_normal(200_000)
        counts, amax = self._hist(x)
        t = qkl.kl_threshold(counts, amax, bits=8)
        assert np.quantile(np.abs(x), 0.95) < t <= amax

    def test_outliers_get_clipped(self):
        """With gross outliers the KL threshold must clip well below amax."""
        rng = np.random.default_rng(11)
        x = rng.standard_normal(200_000)
        x[:10] *= 100.0
        counts, amax = self._hist(x)
        t = qkl.kl_threshold(counts, amax, bits=8)
        assert t < 0.5 * amax

    def test_laplace_threshold_clips_more(self):
        """Laplace has heavier tails than Gaussian -> relatively lower threshold."""
        rng = np.random.default_rng(2)
        g = rng.standard_normal(200_000)
        l = rng.laplace(size=200_000)
        cg, ag = self._hist(g)
        cl, al = self._hist(l)
        tg = qkl.kl_threshold(cg, ag) / ag
        tl = qkl.kl_threshold(cl, al) / al
        assert tl < tg

    def test_kl_beats_minmax_on_bulk_mse(self):
        """With outliers inflating amax, KL gives finer resolution for the bulk
        (KL optimizes distribution fidelity, not worst-case range coverage)."""
        rng = np.random.default_rng(3)
        x = rng.standard_normal(100_000)
        x[:20] *= 50.0  # inject outliers
        counts, amax = self._hist(x)
        t = qkl.kl_threshold(counts, amax, bits=8)
        assert t < 0.5 * amax
        inliers = jnp.asarray(x[np.abs(x) <= np.quantile(np.abs(x), 0.99)],
                              jnp.float32)
        mse_minmax = jnp.mean(
            (inliers - fq.fake_quant(inliers, fq.symmetric_scale(amax, 8))) ** 2)
        mse_kl = jnp.mean(
            (inliers - fq.fake_quant(inliers, fq.symmetric_scale(t, 8))) ** 2)
        assert float(mse_kl) < float(mse_minmax)

    def test_int4_threshold_tighter_than_int8(self):
        rng = np.random.default_rng(4)
        x = rng.standard_normal(100_000)
        counts, amax = self._hist(x)
        t8 = qkl.kl_threshold(counts, amax, bits=8)
        t4 = qkl.kl_threshold(counts, amax, bits=4)
        assert t4 <= t8 * 1.05  # coarser grid should not want a larger range

    def test_empty_histogram_fallback(self):
        assert qkl.kl_threshold(np.zeros(2048), 1.0) == 1.0

    def test_device_hist_feeds_kl(self):
        """End-to-end: on-device histogram -> host KL search."""
        key = jax.random.PRNGKey(5)
        x = jax.random.normal(key, (50_000,))
        amax = float(jnp.max(jnp.abs(x)))
        s = obs.hist_set_range(obs.hist_init(), jnp.float32(amax))
        s = jax.jit(obs.hist_update)(s, x)
        t = qkl.kl_threshold(np.asarray(s["counts"]), amax, bits=8, stride=8)
        assert 0 < t <= amax


def test_hist_counts_do_not_saturate_at_2_24():
    """Scattering +1.0 into a float32 bin silently saturates at 2^24
    (one ulp > 1); the observer must count each batch exactly in int32
    and accumulate subtotals instead."""
    state = obs.hist_init(nbins=8)
    state = obs.hist_set_range(state, jnp.float32(1.0))
    # pretend a bin already holds 2^24 from earlier batches
    state = {**state, "counts": state["counts"].at[0].set(2.0 ** 24)}
    x = jnp.zeros((1000,), jnp.float32)      # all land in bin 0
    state = obs.hist_update(state, x)
    assert float(state["counts"][0]) == 2.0 ** 24 + 1000.0
