"""Quantized NN layers: QuantConv, QuantDense, ConvBN (with fake-BN folding).

TPU-native rebuild of the reference's patched Gluon blocks (SURVEY.md §1.2 R3 +
§2.1 "Conversion driver" / "BN folding" rows; mount empty, see SURVEY.md §0).
Instead of attaching forward-pre-hooks to existing blocks, these are proper
functional modules:

* every layer resolves its own :class:`LayerQuantSpec` from the model-wide
  :class:`QuantPolicy` by its Flax module path (the reference's ``exclude=``
  list becomes path globs);
* weights are fake-quantized from the live fp32 master each forward (symmetric,
  per-channel over the output-channel axis), exactly the reference's weight
  pre-hook scheme — so QAT gradients flow into fp32 masters via STE;
* ``ConvBN`` implements both BN placements: unfolded conv→BN, and the
  Krishnamoorthi-style *fake BN* for QAT, where the quantized conv runs with
  BN-folded weights while batch statistics keep updating (SURVEY.md §2.1
  "BN folding / fake BN": the training variant keeps updating BN stats).

Layout conventions (TPU-friendly): activations NHWC, conv kernels HWIO — the
output-channel axis is last, so per-channel scales broadcast on the minor
(lane) dimension, which is exactly how the Pallas kernels want them.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn

from qtpu.nn.act_quant import ActQuant
from qtpu.nn.config import LayerQuantSpec, QuantMode, QuantPolicy
from qtpu.ops import fakequant as fq
from qtpu.ops import qat_int
from qtpu.ops import qops

Array = jax.Array
Dtype = Any

BN_EPS = 1e-5
BN_MOMENTUM = 0.9


def _resolve(policy: Optional[QuantPolicy], path: Tuple[str, ...]
             ) -> Tuple[Optional[LayerQuantSpec], QuantMode]:
    """Look up this layer's spec in the policy by its module path."""
    if policy is None or policy.mode == QuantMode.OFF:
        return None, QuantMode.OFF
    spec = policy.spec_for("/".join(path))
    if spec is None:
        return None, QuantMode.OFF
    return spec, policy.mode


def _maybe_quant_weight(w: Array, spec: Optional[LayerQuantSpec],
                        mode: QuantMode, channel_axis: int) -> Array:
    if spec is None or not spec.quantize_weights or not mode.quantizes:
        return w
    return fq.fake_quant_weight(
        w, bits=spec.w_bits,
        channel_axis=channel_axis if spec.per_channel else None,
        ste=spec.ste)


def _quant_conv_fn(mod, x: Array, spec, mode, *, strides, padding, groups):
    """Build ``quant_conv(w_fp32) -> conv output`` for a conv-like module.

    Chooses between the fp32 fake-quant simulation and the integer-forward
    path (``qtpu.ops.qat_int``, policy ``qat_forward='int'``).  Either way the
    ActQuant submodule is named ``in_q`` with identical variable structure,
    so checkpoints restore across the switch.
    """
    use_int = (mod.quant is not None and mod.quant.qat_forward == "int"
               and qat_int.int_forward_ok(spec, mode))
    if use_int:
        scale, zp = ActQuant(spec, mode, emit_qparams=True, name="in_q")(x)

        def quant_conv(w: Array) -> Array:
            return qat_int.qat_int_conv(
                x, w, scale, zp, a_bits=spec.a_bits, w_bits=spec.w_bits,
                per_channel=spec.per_channel,
                act_symmetric=spec.act_symmetric, strides=strides,
                padding=padding, groups=groups)

        return quant_conv
    xq = ActQuant(spec, mode, name="in_q")(x)

    def quant_conv(w: Array) -> Array:
        return mod._conv(xq, _maybe_quant_weight(w, spec, mode,
                                                 channel_axis=3))

    return quant_conv


def _serve_vars(mod: nn.Module, spec: LayerQuantSpec, kshape: Tuple[int, ...],
                features: int):
    """Declare the frozen integer-weight variables for SERVE mode.

    Weight storage is int8; int4 weights are nibble-packed along the
    output-channel (last) axis when it is even (half the bytes), matching
    ``qtpu.ops.fakequant.pack_int4``.  Filled by ``qtpu.transform.freeze``.
    """
    packed = spec.w_bits == 4 and features % 2 == 0
    wshape = (*kshape[:-1], features // 2) if packed else kshape
    sshape = (features,) if spec.per_channel else ()
    return dict(
        packed=packed,
        kernel_q=mod.variable("qweights", "kernel_q",
                              lambda: jnp.zeros(wshape, jnp.int8)),
        w_scale=mod.variable("qweights", "w_scale",
                             lambda: jnp.ones(sshape, jnp.float32)),
        colsum=mod.variable("qweights", "colsum",
                            lambda: jnp.zeros((features,), jnp.int32)),
        bias=mod.variable("qweights", "bias",
                          lambda: jnp.zeros((features,), jnp.float32)),
        act_scale=mod.variable("qweights", "act_scale",
                               lambda: jnp.ones((), jnp.float32)),
        act_zp=mod.variable("qweights", "act_zp",
                            lambda: jnp.zeros((), jnp.int32)),
        # static grid kind, stored so flat engines (which see only the frozen
        # qweights tree) requantize on the same affine/symmetric path as this
        # module does above (ADVICE r1: engine/module one-step divergence).
        act_sym=mod.variable("qweights", "act_sym",
                             lambda: jnp.asarray(spec.act_symmetric)),
    )


def _serve_weight(sv: dict) -> Array:
    w = sv["kernel_q"].value
    return fq.unpack_int4(w, axis=-1) if sv["packed"] else w


def _serve_epilogue(acc: Array, sv: dict, spec: LayerQuantSpec) -> Array:
    return qops.dequant_epilogue(
        acc, act_scale=sv["act_scale"].value, act_zp=sv["act_zp"].value,
        w_scale=sv["w_scale"].value, colsum=sv["colsum"].value,
        bias=sv["bias"].value)


class QuantDense(nn.Module):
    """Fully-connected layer with fake-quantized input and weights."""

    features: int
    use_bias: bool = True
    quant: Optional[QuantPolicy] = None
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    # None = backend default (bf16 passes on TPU MXU for fp32 sim convs —
    # fast, and the integer SERVE path is exact regardless).  Use
    # jax.lax.Precision.HIGHEST for bit-faithful fp32 simulation; note the
    # XLA CPU backend has no fast HIGHEST conv path (very slow).

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spec, mode = _resolve(self.quant, self.path)
        if mode == QuantMode.SERVE and spec is not None:
            sv = _serve_vars(self, spec, (x.shape[-1], self.features),
                             self.features)
            x_q = qops.quantize_act(x, sv["act_scale"].value,
                                    sv["act_zp"].value, bits=spec.a_bits,
                                    symmetric=spec.act_symmetric)
            acc = qops.qmatmul(x_q, _serve_weight(sv))
            return _serve_epilogue(acc, sv, spec)
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            (x.shape[-1], self.features), jnp.float32)
        x = ActQuant(spec, mode, name="in_q")(x)
        w = _maybe_quant_weight(kernel, spec, mode, channel_axis=1)
        y = jnp.dot(x.astype(self.dtype), w.astype(self.dtype),
                    precision=self.precision,
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b
        return y


class QuantConv(nn.Module):
    """2-D convolution (NHWC/HWIO) with fake-quantized input and weights.

    ``groups=in_features`` gives the depthwise path (MobileNet,
    BASELINE.json config 3).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    groups: int = 1
    use_bias: bool = True
    quant: Optional[QuantPolicy] = None
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    # None = backend default (bf16 passes on TPU MXU for fp32 sim convs —
    # fast, and the integer SERVE path is exact regardless).  Use
    # jax.lax.Precision.HIGHEST for bit-faithful fp32 simulation; note the
    # XLA CPU backend has no fast HIGHEST conv path (very slow).

    @nn.compact
    def __call__(self, x: Array) -> Array:
        spec, mode = _resolve(self.quant, self.path)
        in_feat = x.shape[-1]
        kshape = (*self.kernel_size, in_feat // self.groups, self.features)
        if mode == QuantMode.SERVE and spec is not None:
            sv = _serve_vars(self, spec, kshape, self.features)
            x_q = qops.quantize_act(x, sv["act_scale"].value,
                                    sv["act_zp"].value, bits=spec.a_bits,
                                    symmetric=spec.act_symmetric)
            acc = qops.qconv2d(x_q, _serve_weight(sv), strides=self.strides,
                               padding=self.padding, groups=self.groups,
                               zp=sv["act_zp"].value)
            return _serve_epilogue(acc, sv, spec)
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            kshape, jnp.float32)
        quant_conv = _quant_conv_fn(self, x, spec, mode, strides=self.strides,
                                    padding=self.padding, groups=self.groups)
        y = quant_conv(kernel)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.features,),
                           jnp.float32)
            y = y + b
        return y

    def _conv(self, x: Array, w: Array) -> Array:
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups, precision=self.precision,
            preferred_element_type=jnp.float32)


class ConvBN(nn.Module):
    """Conv + BatchNorm (+ activation) with quantization-aware BN folding.

    Modes of operation:

    * fp32 / calibration: conv → BN (batch stats in training, running in eval).
    * quantized, ``policy.fold_bn=True``, eval/PTQ: single conv with weights
      folded using *running* stats — W' = W·γ/σ, b' = β − γμ/σ (SURVEY.md §2.1
      offline merge form (a)).
    * quantized, ``policy.fold_bn=True``, training (QAT fake-BN, form (b)): an
      fp32 statistics conv computes batch μ/σ and updates running stats; the
      quantized conv then runs with weights folded by the *batch* stats, so the
      simulated integer numerics match what inference-with-folded-weights will
      see while BN keeps adapting.
    * quantized, ``policy.fold_bn=False``: quantized conv → BN unfolded.

    ``train`` selects BN statistics source; running stats update only when the
    ``batch_stats`` collection is marked mutable by the caller.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Union[str, Sequence[Tuple[int, int]]] = "SAME"
    groups: int = 1
    use_bn: bool = True
    act: Optional[Callable[[Array], Array]] = None
    quant: Optional[QuantPolicy] = None
    dtype: Dtype = jnp.float32
    precision: Optional[jax.lax.Precision] = None
    # None = backend default (bf16 passes on TPU MXU for fp32 sim convs —
    # fast, and the integer SERVE path is exact regardless).  Use
    # jax.lax.Precision.HIGHEST for bit-faithful fp32 simulation; note the
    # XLA CPU backend has no fast HIGHEST conv path (very slow).

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        spec, mode = _resolve(self.quant, self.path)
        in_feat = x.shape[-1]
        kshape = (*self.kernel_size, in_feat // self.groups, self.features)
        if mode == QuantMode.SERVE and spec is not None:
            # BN already folded into kernel_q/bias at freeze time.
            sv = _serve_vars(self, spec, kshape, self.features)
            x_q = qops.quantize_act(x, sv["act_scale"].value,
                                    sv["act_zp"].value, bits=spec.a_bits,
                                    symmetric=spec.act_symmetric)
            acc = qops.qconv2d(x_q, _serve_weight(sv), strides=self.strides,
                               padding=self.padding, groups=self.groups,
                               zp=sv["act_zp"].value)
            y = _serve_epilogue(acc, sv, spec)
            return self.act(y) if self.act else y
        kernel = self.param("kernel", nn.initializers.he_normal(),
                            kshape, jnp.float32)

        if not self.use_bn:
            bias = self.param("bias", nn.initializers.zeros, (self.features,),
                              jnp.float32)
            quant_conv = _quant_conv_fn(self, x, spec, mode,
                                        strides=self.strides,
                                        padding=self.padding,
                                        groups=self.groups)
            y = quant_conv(kernel) + bias
            return self.act(y) if self.act else y

        gamma = self.param("scale", nn.initializers.ones, (self.features,),
                           jnp.float32)
        beta = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        rmean = self.variable("batch_stats", "mean",
                              lambda: jnp.zeros((self.features,), jnp.float32))
        rvar = self.variable("batch_stats", "var",
                             lambda: jnp.ones((self.features,), jnp.float32))
        stats_mutable = (self.is_mutable_collection("batch_stats")
                         and not self.is_initializing())

        fold = (spec is not None and mode.quantizes
                and self.quant is not None and self.quant.fold_bn)

        quant_conv = _quant_conv_fn(self, x, spec, mode, strides=self.strides,
                                    padding=self.padding, groups=self.groups)

        approx = (self.quant is not None and self.quant.fake_bn == "approx")
        if fold and train and approx:
            # Approximate fake BN (single conv — the production QAT scheme,
            # e.g. torch ConvBn2d's approximate forward): fold by *running*
            # stats, un-scale the conv output to recover ≈conv(xq, W_q·σ/γ),
            # then a standard batch-stat BN supplies normalization + stats
            # updates.  Same folded-weight quantization noise to first order
            # as the exact scheme below, at half the conv count in both
            # forward and backward.
            sigma_r = jnp.sqrt(rvar.value + BN_EPS)
            factor = gamma / sigma_r                   # broadcast over O axis
            safe = jnp.where(factor == 0.0, jnp.ones_like(factor), factor)
            y = quant_conv(kernel * factor) / safe
            bmean = jnp.mean(y, axis=(0, 1, 2))
            bvar = jnp.var(y, axis=(0, 1, 2))
            if stats_mutable:
                m = BN_MOMENTUM
                rmean.value = m * rmean.value + (1 - m) * bmean
                rvar.value = m * rvar.value + (1 - m) * bvar
            y = (y - bmean) / jnp.sqrt(bvar + BN_EPS) * gamma + beta
        elif fold:
            if train:
                # Exact QAT fake BN (Krishnamoorthi form (b)): fp32 statistics
                # conv on the *unquantized* input supplies batch stats; the
                # quantized conv runs with batch-σ-folded weights.
                y_fp = self._conv(x, kernel)
                bmean = jnp.mean(y_fp, axis=(0, 1, 2))
                bvar = jnp.var(y_fp, axis=(0, 1, 2))
                if stats_mutable:
                    m = BN_MOMENTUM
                    rmean.value = m * rmean.value + (1 - m) * bmean
                    rvar.value = m * rvar.value + (1 - m) * bvar
                mean, var = bmean, bvar
            else:
                mean, var = rmean.value, rvar.value
            sigma = jnp.sqrt(var + BN_EPS)
            w_fold = kernel * (gamma / sigma)          # broadcast over O axis
            b_fold = beta - gamma * mean / sigma
            y = quant_conv(w_fold) + b_fold
        else:
            y = quant_conv(kernel)
            if train:
                bmean = jnp.mean(y, axis=(0, 1, 2))
                bvar = jnp.var(y, axis=(0, 1, 2))
                if stats_mutable:
                    m = BN_MOMENTUM
                    rmean.value = m * rmean.value + (1 - m) * bmean
                    rvar.value = m * rvar.value + (1 - m) * bvar
                mean, var = bmean, bvar
            else:
                mean, var = rmean.value, rvar.value
            y = (y - mean) / jnp.sqrt(var + BN_EPS) * gamma + beta

        return self.act(y) if self.act else y

    def _conv(self, x: Array, w: Array) -> Array:
        return jax.lax.conv_general_dilated(
            x.astype(self.dtype), w.astype(self.dtype),
            window_strides=self.strides, padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=self.groups, precision=self.precision,
            preferred_element_type=jnp.float32)
