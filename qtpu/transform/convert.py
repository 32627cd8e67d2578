"""Model conversion API — the functional equivalent of the reference's
``convert_model(net, exclude=..., convert_fn=...)`` (SURVEY.md §1.2 R2, §3.1;
mount empty, see §0).

The reference mutates a Gluon block tree in place and attaches hooks.  Here a
"conversion" is pure data: qtpu models carry an optional ``quant`` policy
attribute, so converting = cloning the model definition with a policy attached
(Flax modules are frozen dataclasses — clones are cheap).  Mode switches
(calibrate / online / offline / off) are likewise clones, which retrace under
jit instead of flipping runtime hook state.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

from flax import linen as nn

from qtpu.nn.config import LayerQuantSpec, QuantMode, QuantPolicy


def convert_model(model: nn.Module,
                  policy: Optional[QuantPolicy] = None,
                  *,
                  exclude: Sequence[str] = (),
                  overrides: Sequence[Tuple[str, LayerQuantSpec]] = (),
                  mode: Optional[QuantMode] = None) -> nn.Module:
    """Return a quantized clone of ``model``.

    ``model`` must be a qtpu model (accepts a ``quant`` attribute).  If it
    already carries a policy, ``exclude``/``overrides``/``mode`` refine it.

    Example (the reference's canonical first/last exclusion)::

        qmodel = convert_model(ResNet18(), QuantPolicy.int8_ptq(),
                               exclude=("stem*", "fc"))
    """
    if not hasattr(model, "quant"):
        raise TypeError(
            f"{type(model).__name__} does not accept a quantization policy; "
            "qtpu models must expose a `quant` attribute")
    base = policy if policy is not None else (model.quant or QuantPolicy())
    import dataclasses
    new_policy = dataclasses.replace(
        base,
        exclude=tuple(base.exclude) + tuple(exclude),
        overrides=tuple(base.overrides) + tuple(overrides),
        mode=mode if mode is not None else base.mode)
    return model.clone(quant=new_policy)


def quantize_variables(qmodel: nn.Module, variables, sample, *, rng=None,
                       train: bool = False):
    """Merge trained fp32 variables into a quantized model's variable tree.

    After ``convert_model`` on an already-trained model, the quantized model
    needs its observer/threshold collections initialized; this initializes the
    full tree and overlays the trained params/batch_stats (the functional
    equivalent of the reference converting a net in place while keeping its
    parameters, SURVEY.md §3.1).
    """
    import jax

    rng = rng if rng is not None else jax.random.PRNGKey(0)
    init = jax.jit(qmodel.init, static_argnames="train") if train else \
        jax.jit(qmodel.init)
    fresh = dict(init(rng, sample, train=True) if train else init(rng, sample))
    return _deep_merge(fresh, dict(variables))


def deep_merge(fresh, trained):
    """Overlay trained leaves onto the fresh tree, keeping fresh-only paths.

    A shallow ``{**fresh, **trained}`` would drop quantizer-owned params the
    fp32 baseline never had (e.g. PACT's learnable ``pact_alpha`` lives in
    the 'params' collection alongside the trained weights).  Public: the
    serve CLI reuses it for checkpoint restore (one merge helper, not two
    drifting copies).
    """
    if isinstance(fresh, dict) and isinstance(trained, dict):
        out = dict(fresh)
        for k, v in trained.items():
            out[k] = deep_merge(fresh[k], v) if k in fresh else v
        return out
    return trained


_deep_merge = deep_merge          # backward-compatible private alias


def set_mode(model: nn.Module, mode: QuantMode) -> nn.Module:
    """Clone ``model`` with its quantization mode switched."""
    if getattr(model, "quant", None) is None:
        raise ValueError("model has no quantization policy; convert it first")
    return model.clone(quant=model.quant.with_mode(mode))


def strip_quant(model: nn.Module) -> nn.Module:
    """Clone ``model`` with quantization fully disabled (fp32 baseline)."""
    return model.clone(quant=None)
