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
