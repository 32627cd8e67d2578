"""Freeze/export: calibrated fake-quant model → real integer serving model.

Rebuild of the reference's freeze/deployment-export step (SURVEY.md §2.1
"Freeze/export" row [K-low]; mount empty, §0), but producing an actually
executable integer model rather than a simulation: int8 (or nibble-packed int4)
weights, per-channel scales, BN folded into weights/bias, activation
thresholds on the signed grid, and per-channel integer column sums for the
zero-point correction (see ``qtpu.ops.qops``).

``freeze(qmodel, variables, sample)`` returns ``(serve_model, serve_vars)``
where ``serve_model`` runs ``QuantMode.SERVE`` integer execution; excluded
layers keep their fp32 params and run unquantized.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax.core import unfreeze

from qtpu.nn.config import QuantMode
from qtpu.nn.layers import BN_EPS
from qtpu.ops import fakequant as fq
from qtpu.transform.convert import set_mode
from qtpu.utils import debug

Variables = Dict[str, Any]


def _get(tree, path, default=None):
    node = tree
    for k in path:
        if node is None or k not in node:
            return default
        node = node[k]
    return node


def _iter_qweight_paths(qw_tree, prefix=()):
    """Yield module paths owning a kernel_q leaf in the qweights collection."""
    if isinstance(qw_tree, dict) or hasattr(qw_tree, "items"):
        if "kernel_q" in qw_tree:
            yield prefix
            return
        for k, v in qw_tree.items():
            yield from _iter_qweight_paths(v, prefix + (k,))


def freeze(qmodel: nn.Module, variables: Variables, sample: jax.Array,
           rng: jax.Array | None = None) -> Tuple[nn.Module, Variables]:
    """Materialize integer serving weights from trained+calibrated variables.

    Args:
      qmodel: quantized model (any mode) with a policy whose ``quant_params``
        have been filled by calibration (or QAT EMA stats — both supported).
      variables: full variable dict (params, batch_stats, quant_stats,
        quant_params).
      sample: an example input batch (shapes only; used to init the serve
        model's variable structure).
    """
    policy = qmodel.quant
    if policy is None:
        raise ValueError("model has no quantization policy")
    serve_model = set_mode(qmodel, QuantMode.SERVE)
    rng = rng if rng is not None else jax.random.PRNGKey(0)
    serve_vars = unfreeze(jax.jit(serve_model.init)(rng, sample))

    params = variables.get("params", {})
    batch_stats = variables.get("batch_stats", {})
    quant_params = variables.get("quant_params", {})
    quant_stats = variables.get("quant_stats", {})

    # fp32 params for excluded layers: copy trained values where the serve
    # structure kept them.
    def copy_matching(dst, src):
        for k, v in dst.items():
            if k in src:
                if hasattr(v, "items"):
                    copy_matching(v, src[k])
                else:
                    dst[k] = src[k]
    if "params" in serve_vars:
        copy_matching(serve_vars["params"], unfreeze(params))
    # Excluded ConvBN layers run fp32 WITH BatchNorm at serve time (and the
    # flat engines fold their BN from variables['batch_stats'] at build) —
    # they need the TRAINED running stats, not init's mean=0/var=1.
    if "batch_stats" in serve_vars:
        copy_matching(serve_vars["batch_stats"], unfreeze(batch_stats))

    qw = serve_vars.get("qweights", {})
    for path in _iter_qweight_paths(qw):
        spec = policy.spec_for("/".join(path))
        if spec is None:  # excluded layer: stays fp32
            continue
        if not spec.quantize_weights:
            # the integer SERVE path has no fp32-weight form: freezing
            # would quantize a kernel the QAT/PTQ simulation never
            # quantized, silently diverging from the validated sim —
            # refuse loudly (exclude the layer to serve it fp32)
            raise ValueError(
                f"layer {'/'.join(path)} has quantize_weights=False; the "
                "integer serving path cannot represent fp32 weights — "
                "exclude the layer instead")
        layer_params = _get(params, path)
        if layer_params is None or "kernel" not in layer_params:
            raise ValueError(f"no trained kernel for quantized layer {path}")
        kernel = jnp.asarray(layer_params["kernel"], jnp.float32)
        bn = _get(batch_stats, path)
        if bn is not None and "mean" in bn and "var" in bn:
            # ConvBN: fold with running stats (W' = Wγ/σ, b' = β − γμ/σ)
            gamma = layer_params["scale"]
            beta = layer_params["bias"]
            sigma = jnp.sqrt(bn["var"] + BN_EPS)
            w_f = kernel * (gamma / sigma)
            b_f = beta - gamma * bn["mean"] / sigma
        else:
            w_f = kernel
            b_f = layer_params.get("bias",
                                   jnp.zeros((kernel.shape[-1],), jnp.float32))

        ch_axis = w_f.ndim - 1
        scale_kd = fq.weight_qparams(
            w_f, bits=spec.w_bits,
            channel_axis=ch_axis if spec.per_channel else None)
        w_q = fq.quantize(w_f, scale_kd, bits=spec.w_bits)
        colsum = jnp.sum(w_q.astype(jnp.int32),
                         axis=tuple(range(w_f.ndim - 1)))

        node = _get(qw, path)
        if node["kernel_q"].shape != w_q.shape:      # int4 nibble-packed
            w_store = fq.pack_int4(w_q, axis=-1)
        else:
            w_store = w_q
        node["kernel_q"] = w_store
        node["w_scale"] = (scale_kd.reshape(-1) if spec.per_channel
                           else scale_kd.reshape(()))
        node["colsum"] = colsum
        node["bias"] = jnp.asarray(b_f, jnp.float32)

        # Activation qparams: prefer frozen calibration; fall back to observer
        # stats (QAT EMA path).
        # Explicit flag written by transform.calibrate — no sentinel-value
        # heuristic (a genuine act_scale of exactly 1.0 must stay calibrated).
        aq = _get(quant_params, path + ("in_q",))
        calibrated = aq is not None and bool(aq.get("calibrated", False))
        pact_alpha = _get(params, path + ("in_q", "pact_alpha"))
        if calibrated:
            a_scale = jnp.asarray(aq["act_scale"], jnp.float32)
            a_zp_unsigned = jnp.asarray(aq["act_zp"], jnp.float32)
        elif pact_alpha is not None:
            # PACT QAT never updates observer stats (the fake_quant_pact
            # branch clips to the live α, qtpu/nn/act_quant.py) — the
            # learned grid IS affine over [0, α], so freeze from α
            # directly instead of falling through to empty stats (which
            # silently produced a 1e-12 scale and garbage serving output).
            a_scale, a_zp_unsigned = fq.affine_qparams(
                jnp.zeros(()), jnp.maximum(jnp.asarray(pact_alpha), 1e-6),
                spec.a_bits)
        else:
            st = _get(quant_stats, path + ("in_q",))
            if st is None:
                raise ValueError(f"no activation stats for layer {path}")
            if "count" in st and int(st["count"]) == 0:
                raise ValueError(
                    f"layer {path} was never calibrated and its observer "
                    "saw no batches — run transform.calibrate (or a QAT "
                    "epoch with an EMA observer) before freeze")
            if spec.act_symmetric:
                amax = jnp.maximum(jnp.abs(st["min"]), jnp.abs(st["max"]))
                a_scale = fq.symmetric_scale(amax, spec.a_bits)
                a_zp_unsigned = jnp.zeros(())
            else:
                a_scale, a_zp_unsigned = fq.affine_qparams(
                    st["min"], st["max"], spec.a_bits)
        if spec.act_symmetric:
            zp_signed = jnp.zeros((), jnp.int32)
        else:
            zp_signed = (a_zp_unsigned - (1 << (spec.a_bits - 1))
                         ).astype(jnp.int32)
        node["act_scale"] = a_scale.reshape(())
        node["act_zp"] = zp_signed.reshape(())
        debug.check_frozen_node(node, bits=spec.w_bits,
                                packed=w_store.shape != w_q.shape,
                                path="/".join(path))

    serve_vars["qweights"] = qw
    return serve_model, serve_vars
