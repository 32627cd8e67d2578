"""Quantization configuration: per-layer specs, model-wide policy, modes.

TPU-native replacement for the reference's ``convert_model(net, exclude=...,
convert_fn=...)`` kwargs + mode-switch API (SURVEY.md §1.2 R2/R3; reference mount
empty, behavior per SURVEY.md §2.1).  Instead of mutating blocks and toggling
hook state, configuration is immutable data attached to a model definition:

* :class:`LayerQuantSpec` — how one layer quantizes (bits, granularity, observer).
* :class:`QuantPolicy` — model-wide policy: default spec, glob-based excludes and
  per-layer overrides (the reference's ``exclude=[first, last]`` idiom), plus the
  active :class:`QuantMode`.
* :class:`QuantMode` — static mode; switching modes builds a new model definition
  (cheap dataclass clone) and triggers a retrace, which is the XLA-friendly
  equivalent of the reference's runtime hook toggles.

All types are frozen/hashable so they can sit on Flax module attributes.
"""
from __future__ import annotations

import dataclasses
import enum
import fnmatch
from typing import Optional, Tuple


class QuantMode(enum.Enum):
    """Execution mode of a quantized model (static; retrace on change)."""

    OFF = "off"                    # fp32 passthrough (baseline)
    CALIB_RANGE = "calib_range"    # fp32 forward, update min-max/EMA observers
    CALIB_HIST = "calib_hist"      # fp32 forward, accumulate |x| histograms
    QUANT_ONLINE = "quant_online"  # acts quantized with per-batch min-max
    QUANT_EMA = "quant_ema"        # acts quantized with EMA stats (QAT online)
    QUANT = "quant"                # acts quantized with frozen calibrated params
    SERVE = "serve"                # real integer execution from frozen weights

    @property
    def is_calib(self) -> bool:
        return self in (QuantMode.CALIB_RANGE, QuantMode.CALIB_HIST)

    @property
    def quantizes(self) -> bool:
        return self in (QuantMode.QUANT_ONLINE, QuantMode.QUANT_EMA,
                        QuantMode.QUANT)


@dataclasses.dataclass(frozen=True)
class LayerQuantSpec:
    """How a single layer fake-quantizes.

    Defaults follow the reference's canonical setup (SURVEY.md §2.1): symmetric
    per-channel int8 weights (scale = max|W|/127 recomputed each forward),
    affine int8 activations, pass-through STE.
    """

    w_bits: int = 8
    a_bits: int = 8
    per_channel: bool = True          # weight scale per output channel
    act_observer: str = "minmax"      # 'minmax' | 'ema' | 'kl' | 'pact'
    act_symmetric: bool = False       # affine acts by default; KL forces symmetric
    ema_momentum: float = 0.99
    ste: str = "passthrough"          # 'passthrough' | 'clip'
    quantize_weights: bool = True
    quantize_acts: bool = True
    pact_init: float = 6.0            # initial learnable clip α ('pact' only)

    def __post_init__(self):
        if self.act_observer not in ("minmax", "ema", "kl", "pact"):
            raise ValueError(f"unknown act_observer {self.act_observer!r}")
        if self.act_observer == "kl" and not self.act_symmetric:
            # KL calibration searches a symmetric |x| threshold.
            object.__setattr__(self, "act_symmetric", True)
        if self.act_observer == "pact" and self.act_symmetric:
            # PACT clips to [0, α] — inherently an unsigned affine grid.
            raise ValueError("PACT activations are affine (act_symmetric "
                             "must be False)")


@dataclasses.dataclass(frozen=True)
class QuantPolicy:
    """Model-wide quantization policy, resolved per layer by module path.

    ``exclude``/``overrides`` patterns are ``fnmatch`` globs matched against the
    '/'-joined Flax module path (e.g. ``"conv1"``, ``"*/dense"``, ``"block_*/
    conv2"``).  An excluded layer runs in fp32 — the reference's canonical use is
    skipping the first and last layer (SURVEY.md §2.1 conversion-driver row).
    """

    default: LayerQuantSpec = LayerQuantSpec()
    exclude: Tuple[str, ...] = ()
    overrides: Tuple[Tuple[str, LayerQuantSpec], ...] = ()
    mode: QuantMode = QuantMode.QUANT_ONLINE
    fold_bn: bool = True              # fold BN into conv for the quantized path
    # QAT-time fake-BN scheme (only consulted when fold_bn and training):
    #  'exact'  — fp32 statistics conv + batch-σ fold (Krishnamoorthi form (b),
    #             SURVEY.md §2.1): bit-faithful folded numerics, but a second
    #             full conv in forward AND backward (~2x conv cost).
    #  'approx' — single conv with weights folded by *running* stats, output
    #             rescaled by the fold factor, then batch-stat BN on top (the
    #             production QAT scheme, e.g. torch ConvBn2d's approximate
    #             forward): same folded-quant noise model to first order at
    #             half the conv count (measured speedup recorded in
    #             BASELINE.md via scripts/chip_qat_bench.py).
    fake_bn: str = "exact"
    # QAT forward engine for conv layers:
    #  'sim' — fp32/bf16 conv of the dequantized fake-quant values (the
    #          reference's simulation, SURVEY.md §3.3).
    #  'int' — the same math on the int8 MXU path (qtpu.ops.qat_int): exact
    #          integer accumulation, 2x MXU rate, int8 saved residuals for
    #          the backward.  Falls back to 'sim' per layer for clip-STE or
    #          PACT specs (they need gradient masks the int path drops).
    qat_forward: str = "sim"

    def __post_init__(self):
        if self.fake_bn not in ("exact", "approx"):
            raise ValueError(f"unknown fake_bn scheme {self.fake_bn!r}")
        if self.qat_forward not in ("sim", "int"):
            raise ValueError(f"unknown qat_forward {self.qat_forward!r}")

    def spec_for(self, path: str) -> Optional[LayerQuantSpec]:
        """Spec for the layer at ``path``, or None if excluded / policy off."""
        if any(fnmatch.fnmatch(path, pat) for pat in self.exclude):
            return None
        for pat, spec in self.overrides:
            if fnmatch.fnmatch(path, pat):
                return spec
        return self.default

    def with_mode(self, mode: QuantMode) -> "QuantPolicy":
        return dataclasses.replace(self, mode=mode)

    # Convenience constructors -------------------------------------------------

    @staticmethod
    def int8_ptq(**kw) -> "QuantPolicy":
        """Per-channel INT8 weights + affine INT8 acts, offline calibration."""
        return QuantPolicy(default=LayerQuantSpec(), mode=QuantMode.QUANT, **kw)

    @staticmethod
    def int8_qat(**kw) -> "QuantPolicy":
        """INT8 QAT: EMA-tracked activation ranges, STE gradients."""
        return QuantPolicy(default=LayerQuantSpec(act_observer="ema"),
                           mode=QuantMode.QUANT_EMA, **kw)

    @staticmethod
    def int4_weight_only(a_bits: int = 8, **kw) -> "QuantPolicy":
        """INT4 weights + INT8 acts (BASELINE.json config 5)."""
        return QuantPolicy(
            default=LayerQuantSpec(w_bits=4, a_bits=a_bits, act_observer="ema"),
            mode=QuantMode.QUANT_EMA, **kw)

    @staticmethod
    def int8_qat_pact(w_bits: int = 8, **kw) -> "QuantPolicy":
        """QAT with PACT learnable activation clipping (PAPERS.md) — the
        recommended activation quantizer for low-bit (int4) fine-tunes."""
        return QuantPolicy(
            default=LayerQuantSpec(w_bits=w_bits, act_observer="pact"),
            mode=QuantMode.QUANT_EMA, **kw)
