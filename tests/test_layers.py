"""Tests for qtpu.nn quantized layers: quant error bounds, BN folding, modes."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

import qtpu.nn as qnn
from qtpu.nn import LayerQuantSpec, QuantMode, QuantPolicy

KEY = jax.random.PRNGKey(0)


def _policy(mode=QuantMode.QUANT_ONLINE, **kw):
    return QuantPolicy(mode=mode, **kw)


class TestQuantDense:
    def test_fp32_when_no_policy(self):
        m = qnn.QuantDense(8)
        x = jax.random.normal(KEY, (4, 16))
        v = jax.jit(m.init)(KEY, x)
        assert set(v.keys()) == {"params"}

    def test_quant_error_small(self):
        x = jax.random.normal(KEY, (8, 64))
        fp = qnn.QuantDense(32, name="d")
        vfp = jax.jit(fp.init)(KEY, x)
        qd = fp.clone(quant=_policy())
        vq = {**vfp, **jax.jit(qd.init)(KEY, x)}
        vq["params"] = vfp["params"]
        y_fp = jax.jit(fp.apply)(vfp, x)
        y_q = jax.jit(qd.apply)(vq, x)
        rel = float(jnp.linalg.norm(y_fp - y_q) / jnp.linalg.norm(y_fp))
        assert rel < 0.02, f"int8 dense rel error {rel}"

    def test_int4_worse_than_int8(self):
        x = jax.random.normal(KEY, (8, 64))
        base = qnn.QuantDense(32)
        v = jax.jit(base.init)(KEY, x)
        y_fp = jax.jit(base.apply)(v, x)

        def err(bits):
            m = base.clone(quant=_policy(
                default=LayerQuantSpec(w_bits=bits, a_bits=bits)))
            vq = {**jax.jit(m.init)(KEY, x), "params": v["params"]}
            y = jax.jit(m.apply)(vq, x)
            return float(jnp.linalg.norm(y - y_fp))

        assert err(4) > err(8)


class TestQuantConv:
    def test_shapes_and_groups(self):
        x = jax.random.normal(KEY, (2, 16, 16, 8))
        m = qnn.QuantConv(8, (3, 3), groups=8, quant=_policy())  # depthwise
        v = jax.jit(m.init)(KEY, x)
        assert v["params"]["kernel"].shape == (3, 3, 1, 8)
        y = jax.jit(m.apply)(v, x)
        assert y.shape == (2, 16, 16, 8)

    def test_quant_error_small(self):
        x = jax.random.normal(KEY, (2, 8, 8, 16))
        fp = qnn.QuantConv(32, (3, 3))
        v = jax.jit(fp.init)(KEY, x)
        q = fp.clone(quant=_policy())
        vq = {**jax.jit(q.init)(KEY, x), "params": v["params"]}
        y_fp = jax.jit(fp.apply)(v, x)
        y_q = jax.jit(q.apply)(vq, x)
        rel = float(jnp.linalg.norm(y_fp - y_q) / jnp.linalg.norm(y_fp))
        assert rel < 0.02, f"int8 conv rel error {rel}"

    def test_per_channel_beats_per_tensor(self):
        x = jax.random.normal(KEY, (2, 8, 8, 8))
        fp = qnn.QuantConv(16, (3, 3), use_bias=False)
        v = jax.jit(fp.init)(KEY, x)
        # scale channels very differently to stress per-tensor quant
        k = v["params"]["kernel"] * jnp.logspace(-2, 1, 16)
        v = {"params": {"kernel": k}}
        y_fp = jax.jit(fp.apply)(v, x)

        def err(per_channel):
            m = fp.clone(quant=_policy(
                default=LayerQuantSpec(per_channel=per_channel)))
            vq = {**jax.jit(m.init)(KEY, x), "params": v["params"]}
            return float(jnp.linalg.norm(jax.jit(m.apply)(vq, x) - y_fp))

        assert err(True) < err(False)


class TestExclude:
    def test_excluded_layer_has_no_state_and_exact_output(self):
        x = jax.random.normal(KEY, (4, 16))

        class Net(nn.Module):
            quant: object = None

            @nn.compact
            def __call__(self, x):
                x = qnn.QuantDense(8, quant=self.quant, name="a")(x)
                return qnn.QuantDense(4, quant=self.quant, name="b")(x)

        pol = _policy(exclude=("b",))
        m = Net(quant=pol)
        v = jax.jit(m.init)(KEY, x)
        assert "a" in v["quant_stats"] and "b" not in v.get("quant_stats", {})


class TestConvBNFolding:
    def _setup(self, train_steps=3):
        """Train BN stats a little so running stats are non-trivial."""
        x = jax.random.normal(KEY, (4, 8, 8, 4))
        m = qnn.ConvBN(8, (3, 3), act=None)
        v = jax.jit(m.init, static_argnames="train")(KEY, x, train=True)
        apply_train = jax.jit(
            lambda v, x: m.apply(v, x, train=True, mutable=["batch_stats"]))
        for i in range(train_steps):
            xb = jax.random.normal(jax.random.fold_in(KEY, i), (4, 8, 8, 4)) * 2
            _, mut = apply_train(v, xb)
            v = {**v, "batch_stats": mut["batch_stats"]}
        return m, v, x

    def test_folded_equals_unfolded_in_eval(self):
        """fold(W,b) conv ≡ conv→BN with running stats (SURVEY §4.2 BN-fold).

        Exactness is asserted against a manual fold oracle; the folded-vs-
        unfolded comparison is loose because scale-before-conv vs normalize-
        after-conv reassociates fp32 accumulation (measured ~1e-2 worst case on
        the CPU backend).
        """
        m, v, x = self._setup()
        y_unfolded = jax.jit(m.apply)(v, x)
        # quantization disabled but folding active -> pure fold-math check
        spec = LayerQuantSpec(quantize_weights=False, quantize_acts=False)
        mf = m.clone(quant=QuantPolicy(default=spec, mode=QuantMode.QUANT,
                                       fold_bn=True))
        vf = {**jax.jit(mf.init, static_argnames="train")(KEY, x), **v}
        y_folded = jax.jit(mf.apply)(vf, x)

        p, bs = v["params"], v["batch_stats"]
        sigma = jnp.sqrt(bs["var"] + 1e-5)
        w_fold = p["kernel"] * (p["scale"] / sigma)
        b_fold = p["bias"] - p["scale"] * bs["mean"] / sigma
        y_manual = jax.lax.conv_general_dilated(
            x, w_fold, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC")) + b_fold
        np.testing.assert_allclose(np.asarray(y_folded), np.asarray(y_manual),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(y_unfolded), np.asarray(y_folded),
                                   atol=0.05, rtol=0.05)

    def test_quantized_folded_close_to_fp(self):
        m, v, x = self._setup()
        y_fp = jax.jit(m.apply)(v, x)
        mq = m.clone(quant=_policy(mode=QuantMode.QUANT_ONLINE))
        vq = {**jax.jit(mq.init, static_argnames="train")(KEY, x), **v}
        y_q = jax.jit(mq.apply)(vq, x)
        rel = float(jnp.linalg.norm(y_fp - y_q) / jnp.linalg.norm(y_fp))
        assert rel < 0.05

    def test_fake_bn_training_updates_stats(self):
        """QAT fake-BN: quantized training still updates running statistics."""
        x = jax.random.normal(KEY, (4, 8, 8, 4)) * 3 + 1
        m = qnn.ConvBN(8, (3, 3), quant=_policy(mode=QuantMode.QUANT_ONLINE))
        v = jax.jit(m.init, static_argnames="train")(KEY, x, train=True)
        before = v["batch_stats"]["mean"]
        _, mut = jax.jit(lambda v, x: m.apply(
            v, x, train=True, mutable=["batch_stats", "quant_stats"]))(v, x)
        after = mut["batch_stats"]["mean"]
        assert float(jnp.max(jnp.abs(after - before))) > 1e-3

    def test_approx_fake_bn_equals_unfolded_without_quant(self):
        """fake_bn='approx' with quantization disabled ≡ plain conv→BN train.

        With identity fake-quant the approx scheme is algebraically
        conv(x, W·f)/f → BN_batch == conv(x, W) → BN_batch (f is a per-channel
        scalar); only fp32 reassociation separates them.
        """
        m, v, x = self._setup()
        y_ref, mut_ref = jax.jit(lambda v, x: m.apply(
            v, x, train=True, mutable=["batch_stats"]))(v, x)
        spec = LayerQuantSpec(quantize_weights=False, quantize_acts=False)
        ma = m.clone(quant=QuantPolicy(default=spec, mode=QuantMode.QUANT,
                                       fold_bn=True, fake_bn="approx"))
        va = {**jax.jit(ma.init, static_argnames="train")(KEY, x, train=True),
              **v}
        y_a, mut_a = jax.jit(lambda v, x: ma.apply(
            v, x, train=True, mutable=["batch_stats"]))(va, x)
        np.testing.assert_allclose(np.asarray(y_a), np.asarray(y_ref),
                                   atol=1e-4, rtol=1e-4)
        for k in ("mean", "var"):
            np.testing.assert_allclose(
                np.asarray(mut_a["batch_stats"][k]),
                np.asarray(mut_ref["batch_stats"][k]), atol=1e-4, rtol=1e-4)

    def test_approx_fake_bn_close_to_exact_under_int8(self):
        """The approx and exact fake-BN schemes agree to quant-noise order."""
        m, v, x = self._setup()

        def run(fake_bn):
            mq = m.clone(quant=_policy(mode=QuantMode.QUANT_ONLINE,
                                       fake_bn=fake_bn))
            vq = {**jax.jit(mq.init, static_argnames="train")(
                KEY, x, train=True), **v}
            y, _ = jax.jit(lambda v, x: mq.apply(
                v, x, train=True,
                mutable=["batch_stats", "quant_stats"]))(vq, x)
            return y

        y_exact, y_approx = run("exact"), run("approx")
        rel = float(jnp.linalg.norm(y_exact - y_approx)
                    / jnp.linalg.norm(y_exact))
        assert rel < 0.1, f"approx vs exact fake-BN rel error {rel}"

    def test_approx_fake_bn_grads_and_stats(self):
        """approx fake-BN: grads reach fp32 masters; running stats update."""
        x = jax.random.normal(KEY, (4, 8, 8, 4)) * 2 + 1
        m = qnn.ConvBN(8, (3, 3), quant=_policy(mode=QuantMode.QUANT_ONLINE,
                                                fake_bn="approx"))
        v = jax.jit(m.init, static_argnames="train")(KEY, x, train=True)

        def loss(params):
            y, mut = m.apply({**v, "params": params}, x, train=True,
                             mutable=["batch_stats", "quant_stats"])
            return jnp.sum(y ** 2), mut

        (g, mut) = jax.jit(jax.grad(loss, has_aux=True))(v["params"])
        assert float(jnp.linalg.norm(g["kernel"])) > 0
        assert float(jnp.linalg.norm(g["scale"])) > 0
        drift = mut["batch_stats"]["mean"] - v["batch_stats"]["mean"]
        assert float(jnp.max(jnp.abs(drift))) > 1e-3

    def test_fake_bn_grads_flow_to_master_weights(self):
        """STE: gradients reach the fp32 kernel through the folded+quantized path."""
        x = jax.random.normal(KEY, (4, 8, 8, 4))
        m = qnn.ConvBN(8, (3, 3), quant=_policy(mode=QuantMode.QUANT_ONLINE))
        v = jax.jit(m.init, static_argnames="train")(KEY, x, train=True)

        def loss(params):
            y, _ = m.apply({**v, "params": params}, x, train=True,
                           mutable=["batch_stats", "quant_stats"])
            return jnp.sum(y ** 2)

        g = jax.jit(jax.grad(loss))(v["params"])
        assert float(jnp.linalg.norm(g["kernel"])) > 0
        assert float(jnp.linalg.norm(g["scale"])) > 0  # BN gamma gets grads too


class TestActQuantModes:
    def test_quant_mode_uses_frozen_params_only(self):
        """In QUANT mode the scale must come from quant_params, not the batch."""
        spec = LayerQuantSpec()
        m = qnn.ActQuant(spec, QuantMode.QUANT)
        x1 = jax.random.normal(KEY, (32,))
        v = jax.jit(m.init)(KEY, x1)
        v = {**v, "quant_params": {**v["quant_params"],
                                   "act_scale": jnp.float32(0.5),
                                   "act_zp": jnp.float32(3.0)}}
        y_small = jax.jit(m.apply)(v, x1)
        y_big = jax.jit(m.apply)(v, x1 * 100)
        # same frozen grid: big inputs clip at (qmax - zp) * scale
        assert float(jnp.max(y_big)) <= (255 - 3) * 0.5 + 1e-5
        # inside the representable range [-1.5, 126] the error is <= scale/2
        inside = (x1 >= -1.5) & (x1 <= 126.0)
        assert float(jnp.max(jnp.where(inside, jnp.abs(y_small - x1), 0.0))) \
            <= 0.25 + 1e-5

    def test_ema_mode_updates_only_when_mutable(self):
        spec = LayerQuantSpec(act_observer="ema")
        m = qnn.ActQuant(spec, QuantMode.QUANT_EMA)
        x = jax.random.normal(KEY, (64,))
        v = jax.jit(m.init)(KEY, x)
        _, mut = jax.jit(lambda v, x: m.apply(v, x, mutable=["quant_stats"]))(v, x)
        assert int(mut["quant_stats"]["count"]) == 1
        y = jax.jit(m.apply)(v, x)  # not mutable: read-only apply works
        assert y.shape == x.shape
