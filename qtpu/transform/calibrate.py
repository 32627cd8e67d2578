"""Post-training calibration driver: collect → search → freeze thresholds.

Rebuild of the reference's calibration pass (SURVEY.md §3.2; mount empty, §0).
The reference's hooks sync a histogram to host per layer per batch; here the
range and histogram passes are jit-compiled device loops over the
``quant_stats`` collection, and only the final KL threshold *search* touches
host numpy (once per layer).

Flow (two device passes, matching the two-pass histogram scheme in
``qtpu.calib.observers``)::

    qmodel   = convert_model(model, policy)                  # any mode
    variables = calibrate(qmodel, variables, batches)        # fills quant_params
    qmodel   = set_mode(qmodel, QuantMode.QUANT)             # frozen thresholds
"""
from __future__ import annotations

from typing import Any, Dict, Iterable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from flax.core import unfreeze

from qtpu.calib.kl import kl_threshold
from qtpu.nn.act_quant import PARAMS_COL, STATS_COL
from qtpu.nn.config import QuantMode
from qtpu.ops import fakequant as fq
from qtpu.transform.convert import set_mode

Variables = Dict[str, Any]


def _layer_paths(stats: Dict) -> Iterable[Tuple[str, ...]]:
    """Yield module paths of ActQuant instances ('.../in_q') in a stats tree."""
    flat = jax.tree_util.tree_flatten_with_path(stats)[0]
    seen = set()
    for keypath, _ in flat:
        keys = tuple(k.key for k in keypath)
        if len(keys) >= 2:
            seen.add(keys[:-1])  # drop leaf name -> ActQuant path
    return sorted(seen)


def _get(tree: Dict, path: Tuple[str, ...]) -> Dict:
    node = tree
    for k in path:
        node = node[k]
    return node


def calibrate(qmodel: nn.Module, variables: Variables,
              batches: Iterable[Any], *, apply_kwargs: Optional[dict] = None
              ) -> Variables:
    """Run calibration over ``batches`` and freeze activation thresholds.

    Returns a new ``variables`` dict with ``quant_params`` (act_scale/act_zp)
    populated per quantized layer.  ``batches`` may be any iterable of model
    inputs; it is iterated twice if any layer uses the KL observer, so pass a
    list (not a generator) in that case.
    """
    policy = qmodel.quant
    if policy is None:
        raise ValueError("model has no quantization policy")
    apply_kwargs = dict(apply_kwargs or {})
    batches = list(batches)

    # ---- pass 1: activation ranges (min-max / EMA) ----
    range_model = set_mode(qmodel, QuantMode.CALIB_RANGE)

    @jax.jit
    def range_step(vs, batch):
        _, mut = range_model.apply(vs, batch, mutable=[STATS_COL],
                                   **apply_kwargs)
        # weight-only policies / fully-excluded models own no ActQuant
        # variables, so the mutated collection may be absent entirely
        if STATS_COL not in mut:
            return vs
        return {**vs, STATS_COL: mut[STATS_COL]}

    variables = dict(variables)
    # Reset observer state so calibrate() is idempotent: a second run
    # (PTQ -> QAT -> re-calibrate is a normal loop) must not merge new
    # ranges into stale min/max, nor add histogram mass on top of counts
    # binned against the PREVIOUS run's hist_amax (two incompatible
    # binnings summed would skew the KL threshold).
    prior = unfreeze(variables.get(STATS_COL, {}))
    if prior:
        for p in _layer_paths(prior):
            node = _get(prior, p)
            if "count" in node:
                node["count"] = jnp.zeros((), jnp.int32)
            if "hist" in node:
                node["hist"] = jnp.zeros_like(node["hist"])
        variables[STATS_COL] = prior
    for b in batches:
        variables = range_step(variables, b)

    stats = unfreeze(variables.get(STATS_COL, {}))
    if not stats:
        return variables

    needs_hist = any("hist" in _get(stats, p) for p in _layer_paths(stats))

    # ---- pass 2 (KL only): seed histogram ranges, accumulate histograms ----
    if needs_hist:
        for p in _layer_paths(stats):
            node = _get(stats, p)
            if "hist" in node:
                amax = jnp.maximum(jnp.abs(node["min"]), jnp.abs(node["max"]))
                node["hist_amax"] = jnp.maximum(amax, 1e-12)
        variables[STATS_COL] = stats
        hist_model = set_mode(qmodel, QuantMode.CALIB_HIST)

        @jax.jit
        def hist_step(vs, batch):
            _, mut = hist_model.apply(vs, batch, mutable=[STATS_COL],
                                      **apply_kwargs)
            return {**vs, STATS_COL: mut[STATS_COL]}

        for b in batches:
            variables = hist_step(variables, b)
        stats = unfreeze(variables[STATS_COL])

    # ---- freeze thresholds into quant_params ----
    qparams = unfreeze(variables.get(PARAMS_COL, {}))
    for p in _layer_paths(stats):
        node = _get(stats, p)
        layer_path = "/".join(p[:-1])      # drop the 'in_q' child name
        spec = policy.spec_for(layer_path)
        if spec is None:
            continue
        target = _get(qparams, p)
        if "hist" in node:                  # KL observer → symmetric threshold
            counts = np.asarray(node["hist"])
            amax = float(node["hist_amax"])
            t = kl_threshold(counts, amax, bits=spec.a_bits)
            target["act_scale"] = fq.symmetric_scale(jnp.float32(t), spec.a_bits)
            target["act_zp"] = jnp.zeros((), jnp.float32)
        elif spec.act_symmetric:
            amax = jnp.maximum(jnp.abs(node["min"]), jnp.abs(node["max"]))
            target["act_scale"] = fq.symmetric_scale(amax, spec.a_bits)
            target["act_zp"] = jnp.zeros((), jnp.float32)
        else:
            scale, zp = fq.affine_qparams(node["min"], node["max"], spec.a_bits)
            target["act_scale"] = scale
            target["act_zp"] = zp
        target["calibrated"] = jnp.ones((), jnp.bool_)

    out = dict(variables)
    out[STATS_COL] = stats
    out[PARAMS_COL] = qparams
    return out
