"""Tests for freeze/export + integer SERVE execution (sim↔int parity).

Tolerances note: the integer path is exact on the quantized grid; the fp32
*simulation* uses the backend's default conv precision (bf16-level passes on
both XLA:CPU and TPU MXU), so sim-vs-serve differences up to ~1-2% relative are
precision noise of the sim, not quantization error (measured; see
qtpu/ops/qops.py docstring).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import qtpu.nn as qnn
from qtpu.models import get_model
from qtpu.nn import LayerQuantSpec, QuantMode, QuantPolicy
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def _calibrated_lenet(policy):
    m = get_model("lenet5")
    x = jax.random.normal(KEY, (4, 28, 28, 1))
    qm = convert_model(m, policy)
    qv = jax.jit(qm.init)(KEY, x)
    batches = [jax.random.normal(jax.random.fold_in(KEY, i), (8, 28, 28, 1))
               for i in range(3)]
    qv = calibrate(qm, qv, batches)
    return qm, qv, x


class TestFreezeServe:
    def test_int8_serve_matches_sim(self):
        qm, qv, x = _calibrated_lenet(QuantPolicy.int8_ptq())
        y_sim = jax.jit(qm.apply)(qv, x)
        sm, sv = freeze(qm, qv, x)
        y_srv = jax.jit(sm.apply)(sv, x)
        rel = float(jnp.linalg.norm(y_srv - y_sim) / jnp.linalg.norm(y_sim))
        assert rel < 0.03, f"serve deviates from sim: rel={rel}"

    def test_serve_weights_are_integer(self):
        qm, qv, x = _calibrated_lenet(QuantPolicy.int8_ptq())
        _, sv = freeze(qm, qv, x)
        for name in ("conv1", "conv2", "fc1", "fc2", "fc3"):
            node = sv["qweights"][name]
            assert node["kernel_q"].dtype == jnp.int8
            assert node["colsum"].dtype == jnp.int32
            assert float(jnp.max(jnp.abs(node["kernel_q"]))) <= 127

    def test_int4_packed_and_close(self):
        pol = QuantPolicy(default=LayerQuantSpec(w_bits=4),
                          mode=QuantMode.QUANT)
        qm, qv, x = _calibrated_lenet(pol)
        y_sim = jax.jit(qm.apply)(qv, x)
        sm, sv = freeze(qm, qv, x)
        # fc1 has 120 outputs -> packed to 60 int8 bytes per row
        assert sv["qweights"]["fc1"]["kernel_q"].shape == (400, 60)
        y_srv = jax.jit(sm.apply)(sv, x)
        rel = float(jnp.linalg.norm(y_srv - y_sim) / jnp.linalg.norm(y_sim))
        assert rel < 0.05

    @pytest.mark.parametrize("w_bits,a_bits", [(6, 6), (5, 8), (8, 6)])
    def test_arbitrary_bitwidths_freeze_and_serve(self, w_bits, a_bits):
        """The reference's bit-width knob is CONFIGURABLE, not {4,8}-only
        (SURVEY §2.1 weight fake-quant row): odd widths must flow through
        convert -> calibrate -> freeze -> integer serve.  Non-nibble widths
        store on the int8 carrier (no packing), grids are (2^b - 1)-point
        symmetric for weights."""
        pol = QuantPolicy(default=LayerQuantSpec(w_bits=w_bits, a_bits=a_bits),
                          mode=QuantMode.QUANT)
        qm, qv, x = _calibrated_lenet(pol)
        y_sim = jax.jit(qm.apply)(qv, x)
        sm, sv = freeze(qm, qv, x)
        node = sv["qweights"]["conv1"]
        assert node["kernel_q"].dtype == jnp.int8
        qmax = (1 << (w_bits - 1)) - 1
        assert float(jnp.max(jnp.abs(node["kernel_q"]))) <= qmax
        y_srv = jax.jit(sm.apply)(sv, x)
        rel = float(jnp.linalg.norm(y_srv - y_sim) / jnp.linalg.norm(y_sim))
        assert rel < 0.05, f"w{w_bits}a{a_bits}: rel={rel}"

    def test_bitwidth_monotone_quant_error(self):
        """More weight bits -> sim tracks the fp32 model more closely
        (coarse monotonicity across 2/4/8 on the same calibrated net)."""
        m = get_model("lenet5")
        x = jax.random.normal(KEY, (8, 28, 28, 1))
        fp_m = get_model("lenet5")
        fp_v = jax.jit(fp_m.init)(KEY, x)
        errs = {}
        for wb in (2, 4, 8):
            pol = QuantPolicy(default=LayerQuantSpec(w_bits=wb, a_bits=8),
                              mode=QuantMode.QUANT)
            qm = convert_model(m, pol)
            qv = jax.jit(qm.init)(KEY, x)
            # share the fp32 weights so only quantization differs
            qv = {**qv, "params": fp_v["params"]}
            qv = calibrate(qm, qv, [x])
            y_fp = jax.jit(fp_m.apply)(fp_v, x)
            y_q = jax.jit(qm.apply)(qv, x)
            errs[wb] = float(jnp.linalg.norm(y_q - y_fp)
                             / jnp.linalg.norm(y_fp))
        assert errs[8] < errs[4] < errs[2], errs

    def test_freeze_carries_trained_bn_stats_for_excluded_layers(self):
        """An EXCLUDED ConvBN serves fp32 WITH BatchNorm — freeze must copy
        the TRAINED running stats into serve_vars (init's mean=0/var=1
        silently mis-normalized the excluded stem; both the module path
        and the flat engines read variables['batch_stats'])."""
        import optax

        from qtpu.train import create_train_state, make_train_step

        m = get_model("resnet20", num_classes=10)
        m = m.clone(stage_sizes=(1, 1))
        x = jax.random.normal(KEY, (8, 16, 16, 3))
        y = jnp.zeros((8,), jnp.int32)
        qm = convert_model(m, QuantPolicy.int8_ptq(exclude=("stem*",)))
        tx = optax.sgd(1e-2)
        state = create_train_state(qm, KEY, x, tx)
        step = make_train_step(qm, tx)
        for _ in range(3):                   # move BN stats off init
            state, _ = step(state, x, y)
        qv = calibrate(qm, state.variables(), [x])
        sm, sv = freeze(qm, qv, x)
        trained_bn = qv["batch_stats"]["stem"]
        frozen_bn = sv["batch_stats"]["stem"]
        for k in ("mean", "var"):
            np.testing.assert_allclose(np.asarray(frozen_bn[k]),
                                       np.asarray(trained_bn[k]))
        assert float(jnp.abs(frozen_bn["mean"]).max()) > 0  # actually moved
        # and the serve output tracks the trained quantized-eval output
        y_sim = jax.jit(qm.apply, static_argnames="train")(
            qv, x, train=False)
        y_srv = jax.jit(sm.apply)(sv, x)
        rel = float(jnp.linalg.norm(y_srv - y_sim) / jnp.linalg.norm(y_sim))
        assert rel < 0.05, rel

    def test_pact_qat_freeze_uses_alpha(self):
        """PACT QAT never fills observer stats (it clips to the live α);
        freeze must derive the serving grid from α — the stats fallback
        produced scale=1e-12 and garbage logits with no error."""
        pol = QuantPolicy.int8_qat_pact()
        m = get_model("lenet5")
        x = jax.random.normal(KEY, (4, 28, 28, 1))
        qm = convert_model(m, pol)
        qv = dict(jax.jit(qm.init, static_argnames="train")(KEY, x,
                                                            train=True))
        sm, sv = freeze(qm, qv, x)          # no calibrate — the QAT path
        node = sv["qweights"]["conv1"]
        alpha = float(qv["params"]["conv1"]["in_q"]["pact_alpha"])
        assert float(node["act_scale"]) == pytest.approx(alpha / 255.0,
                                                         rel=1e-5)
        y_srv = np.asarray(jax.jit(sm.apply)(sv, x))
        assert np.abs(y_srv).max() > 1e-3    # not collapsed to ~0

    def test_freeze_refuses_unquantized_weights(self):
        """quantize_weights=False has no integer serving form — freeze must
        refuse loudly instead of quantizing a kernel the QAT/PTQ sim never
        quantized (silent accuracy divergence)."""
        pol = QuantPolicy(default=LayerQuantSpec(quantize_weights=False),
                          mode=QuantMode.QUANT)
        qm, qv, x = _calibrated_lenet(pol)
        with pytest.raises(ValueError, match="quantize_weights"):
            freeze(qm, qv, x)

    def test_calibrate_weight_only_policy_no_crash(self):
        """Weight-only policies own no ActQuant variables; calibrate must
        be a no-op, not a KeyError."""
        pol = QuantPolicy(default=LayerQuantSpec(quantize_acts=False),
                          mode=QuantMode.QUANT)
        m = get_model("lenet5")
        x = jax.random.normal(KEY, (4, 28, 28, 1))
        qm = convert_model(m, pol)
        qv = dict(jax.jit(qm.init)(KEY, x))
        out = calibrate(qm, qv, [x])        # must not raise
        assert "params" in out

    def test_calibrate_is_idempotent(self):
        """Re-calibrating with new data must reflect ONLY the new data
        (stale min/max and histogram mass used to accumulate across
        runs — the PTQ→QAT→re-freeze loop silently widened ranges)."""
        m = get_model("lenet5")
        wide = jax.random.normal(KEY, (8, 28, 28, 1)) * 10.0
        narrow = jax.random.normal(jax.random.fold_in(KEY, 1),
                                   (8, 28, 28, 1)) * 0.1
        qm = convert_model(m, QuantPolicy.int8_ptq())
        qv = dict(jax.jit(qm.init)(KEY, wide))
        qv_wide_then_narrow = calibrate(qm, calibrate(qm, qv, [wide]),
                                        [narrow])
        qv_narrow_only = calibrate(qm, dict(jax.jit(qm.init)(KEY, wide)),
                                   [narrow])
        s1 = float(qv_wide_then_narrow["quant_params"]["conv1"]["in_q"]
                   ["act_scale"])
        s2 = float(qv_narrow_only["quant_params"]["conv1"]["in_q"]
                   ["act_scale"])
        assert s1 == pytest.approx(s2, rel=1e-6), (s1, s2)

    def test_excluded_layer_stays_fp32(self):
        pol = QuantPolicy.int8_ptq(exclude=("conv1", "fc3"))
        qm, qv, x = _calibrated_lenet(pol)
        sm, sv = freeze(qm, qv, x)
        assert "conv1" not in sv.get("qweights", {})
        assert "fc3" not in sv.get("qweights", {})
        # fp32 params carried over exactly
        np.testing.assert_array_equal(
            np.asarray(sv["params"]["conv1"]["kernel"]),
            np.asarray(qv["params"]["conv1"]["kernel"]))
        y = jax.jit(sm.apply)(sv, x)
        y_sim = jax.jit(qm.apply)(qv, x)
        rel = float(jnp.linalg.norm(y - y_sim) / jnp.linalg.norm(y_sim))
        assert rel < 0.03

    def test_convbn_fold_into_serve(self):
        """ConvBN freeze: BN folded into integer weights; output close to
        the quantized-sim eval path."""
        x = jax.random.normal(KEY, (4, 8, 8, 4))
        m = qnn.ConvBN(8, (3, 3), act=jax.nn.relu,
                       quant=QuantPolicy.int8_ptq(), name="cb")
        qv = jax.jit(m.init, static_argnames="train")(KEY, x, train=True)
        # a couple of training steps so BN stats are non-trivial
        tr = jax.jit(lambda v, x: m.apply(
            v, x, train=True, mutable=["batch_stats", "quant_stats"]))
        v = dict(qv)
        for i in range(3):
            xb = jax.random.normal(jax.random.fold_in(KEY, i), (4, 8, 8, 4)) * 2
            _, mut = tr(v, xb)
            v.update(mut)
        v = calibrate(m, v, [x])
        y_sim = jax.jit(m.apply)(v, x)
        sm, sv = freeze(m, v, x)
        assert sv["qweights"]["kernel_q"].dtype == jnp.int8
        y_srv = jax.jit(sm.apply)(sv, x)
        rel = float(jnp.linalg.norm(y_srv - y_sim) /
                    (float(jnp.linalg.norm(y_sim)) + 1e-9))
        assert rel < 0.05

    def test_symmetric_act_serve(self):
        pol = QuantPolicy(default=LayerQuantSpec(act_symmetric=True,
                                                 per_channel=True),
                          mode=QuantMode.QUANT)
        qm, qv, x = _calibrated_lenet(pol)
        sm, sv = freeze(qm, qv, x)
        assert int(sv["qweights"]["conv1"]["act_zp"]) == 0
        y_sim = jax.jit(qm.apply)(qv, x)
        y_srv = jax.jit(sm.apply)(sv, x)
        rel = float(jnp.linalg.norm(y_srv - y_sim) / jnp.linalg.norm(y_sim))
        assert rel < 0.03
