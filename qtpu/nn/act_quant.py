"""Activation quantizer module: observer state + fake-quant, mode-switched.

TPU-native equivalent of the reference's ``register_forward_pre_hook`` input
quantizers (SURVEY.md §2.1 "Input/activation fake-quant" row; mount empty, see
SURVEY.md §0).  The three reference act-quant modes are reproduced:

* per-batch min-max  (``QuantMode.QUANT_ONLINE``),
* EMA running min-max during training (``QuantMode.QUANT_EMA``),
* frozen offline thresholds from calibration (``QuantMode.QUANT``).

Observer state lives in the ``quant_stats`` Flax collection; frozen thresholds
in ``quant_params``.  The variable structure depends only on the spec (never on
the mode), so checkpoints restore cleanly across mode switches.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from qtpu.calib import observers as obs
from qtpu.nn.config import LayerQuantSpec, QuantMode
from qtpu.ops import fakequant as fq

STATS_COL = "quant_stats"
PARAMS_COL = "quant_params"


class ActQuant(nn.Module):
    """Quantizes (or observes) the input activation of one layer.

    ``emit_qparams=True`` (integer-forward QAT, ``qtpu.ops.qat_int``): run the
    same observer updates but return the layer's live ``(scale, zp)`` grid
    instead of the fake-quantized tensor, so the consumer can quantize to real
    int8 codes itself.  The variable structure is identical either way, so
    checkpoints restore across the sim/int switch.  Only valid in quantizing
    modes (and not for PACT, whose learnable α needs the fake-quant gradient).
    """

    spec: Optional[LayerQuantSpec]
    mode: QuantMode = QuantMode.OFF
    emit_qparams: bool = False

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        spec = self.spec
        if spec is None or not spec.quantize_acts or self.mode == QuantMode.OFF:
            return x

        # --- state (structure depends on spec only) ---
        vmin = self.variable(STATS_COL, "min", lambda: jnp.zeros((), jnp.float32))
        vmax = self.variable(STATS_COL, "max", lambda: jnp.zeros((), jnp.float32))
        vcount = self.variable(STATS_COL, "count", lambda: jnp.zeros((), jnp.int32))
        if spec.act_observer == "kl":
            vhist = self.variable(STATS_COL, "hist",
                                  lambda: jnp.zeros((obs.HIST_NBINS,), jnp.float32))
            vamax = self.variable(STATS_COL, "hist_amax",
                                  lambda: jnp.zeros((), jnp.float32))
        vscale = self.variable(PARAMS_COL, "act_scale",
                               lambda: jnp.ones((), jnp.float32))
        vzp = self.variable(PARAMS_COL, "act_zp",
                            lambda: jnp.zeros((), jnp.float32))
        # Explicit calibration marker (set by transform.calibrate) so freeze
        # never has to infer "calibrated" from a sentinel scale value.
        self.variable(PARAMS_COL, "calibrated",
                      lambda: jnp.zeros((), jnp.bool_))

        # PACT (Choi et al. 2018, PAPERS.md): learnable clip threshold α in
        # the trainable params collection — the QAT optimizer learns it
        # alongside the weights.  Its grid is affine_qparams(0, α), so the
        # calibrate/freeze/serve pipeline is unchanged: CALIB_RANGE records
        # (0, α) as the observed range.
        alpha = (self.param("pact_alpha",
                            lambda _: jnp.asarray(spec.pact_init, jnp.float32))
                 if spec.act_observer == "pact" else None)

        # Don't pollute observer state with the init-time sample batch.
        mutable = (self.is_mutable_collection(STATS_COL)
                   and not self.is_initializing())
        state = {"min": vmin.value, "max": vmax.value, "count": vcount.value}

        if self.mode == QuantMode.CALIB_RANGE:
            if mutable:
                if spec.act_observer == "pact":
                    vmin.value = jnp.zeros((), jnp.float32)
                    vmax.value = jnp.asarray(alpha, jnp.float32)
                    vcount.value = vcount.value + 1
                else:
                    new = (obs.ema_update(state, x, spec.ema_momentum)
                           if spec.act_observer == "ema"
                           else obs.minmax_update(state, x))
                    vmin.value, vmax.value, vcount.value = (
                        new["min"], new["max"], new["count"])
            return x

        if self.mode == QuantMode.CALIB_HIST:
            if spec.act_observer == "kl" and mutable:
                h = {"counts": vhist.value, "amax": vamax.value}
                h = obs.hist_update(h, x)
                vhist.value = h["counts"]
            return x

        # --- quantizing modes: pick (scale, zp) ---
        if self.emit_qparams:
            if alpha is not None:
                raise ValueError("emit_qparams is unavailable for PACT specs")
            if self.mode == QuantMode.QUANT_ONLINE:
                return self._qparams(jnp.min(x), jnp.max(x), spec)
            if self.mode == QuantMode.QUANT_EMA:
                if mutable:
                    new = obs.ema_update(state, x, spec.ema_momentum)
                    vmin.value, vmax.value, vcount.value = (
                        new["min"], new["max"], new["count"])
                    state = new
                return self._qparams(state["min"], state["max"], spec)
            if self.mode == QuantMode.QUANT:
                return vscale.value, vzp.value
            raise ValueError(f"emit_qparams unsupported in mode {self.mode}")
        if alpha is not None and self.mode in (QuantMode.QUANT_ONLINE,
                                               QuantMode.QUANT_EMA):
            # training-time PACT: clip to the live α (α gradient via clip)
            return fq.fake_quant_pact(x, alpha, bits=spec.a_bits,
                                      ste=spec.ste)
        if self.mode == QuantMode.QUANT_ONLINE:
            xmin, xmax = jnp.min(x), jnp.max(x)
            scale, zp = self._qparams(xmin, xmax, spec)
        elif self.mode == QuantMode.QUANT_EMA:
            if mutable:
                new = obs.ema_update(state, x, spec.ema_momentum)
                vmin.value, vmax.value, vcount.value = new["min"], new["max"], new["count"]
                state = new
            scale, zp = self._qparams(state["min"], state["max"], spec)
        elif self.mode == QuantMode.QUANT:
            scale, zp = vscale.value, vzp.value
        else:  # pragma: no cover
            raise ValueError(f"unhandled mode {self.mode}")

        signed = spec.act_symmetric
        return fq.fake_quant(x, scale, zp, bits=spec.a_bits, signed=signed,
                             symmetric=spec.act_symmetric, ste=spec.ste)

    @staticmethod
    def _qparams(xmin, xmax, spec: LayerQuantSpec):
        if spec.act_symmetric:
            amax = jnp.maximum(jnp.abs(xmin), jnp.abs(xmax))
            return fq.symmetric_scale(amax, spec.a_bits), jnp.zeros((), jnp.float32)
        return fq.affine_qparams(xmin, xmax, spec.a_bits)
