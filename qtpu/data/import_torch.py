"""Import pretrained torch checkpoints (torchvision naming) into qtpu models.

The reference's entry workflow starts from pretrained model-zoo weights
(SURVEY.md §1.2 R1/R6: gluoncv ``get_model(..., pretrained=True)`` [K-high];
mount empty, §0) — convert → calibrate → evaluate.  This environment is
offline (no downloadable weights), but ``torch`` (cpu) is baked in and
torchvision-convention ``state_dict`` checkpoints (``.pth``) are the
de-facto interchange format for exactly the model families qtpu carries
(ResNet-18/50, MobileNet-v2).  This module maps such checkpoints into
qtpu's Flax variables so that the moment a real checkpoint appears, the
real-data accuracy column (BASELINE.md) becomes runnable end-to-end:

    sd   = load_torch_checkpoint("resnet50.pth")
    model = get_model("resnet50", torch_pad=True)
    vars  = model.init(key, x, train=False)
    vars  = import_torch_state("resnet50", sd, vars)

Build models with ``torch_pad=True``: torch pads stride-2 convs
symmetrically ((1,1) / (3,3)) where XLA's SAME pads asymmetrically
((0,1) / (2,3)); without it imported features are spatially shifted.

Tensor-layout mapping (verified by forward-parity tests against minimal
torch reference nets using torchvision's exact module naming —
tests/test_import_torch.py; rel err ≤1e-5 on random init):

    conv weight   OIHW -> HWIO            transpose (2, 3, 1, 0)
    depthwise     (C, 1, k, k) -> (k, k, 1, C)   same transpose
    batchnorm     weight/bias/running_mean/running_var
                    -> params scale/bias + batch_stats mean/var
    linear        (out, in) -> (in, out)  transpose (1, 0)

The import is strict both ways: every qtpu parameter must be filled with a
shape-matching tensor, and every checkpoint tensor (except
``num_batches_tracked`` bookkeeping) must be consumed — naming or
architecture drift fails loudly instead of silently zero-filling.

Coverage is resnet18/34/50/101 + mobilenet_v2 — the served families with
a canonical torchvision naming convention.  **mobilenet_v1 is a conscious
omission**: torchvision ships no MobileNet-v1, so there is no canonical
``state_dict`` naming to map from; third-party v1 checkpoints disagree on
layer names and would need a per-source mapping.  lenet5 likewise has no
zoo convention.  ``supported_models()`` is the authoritative registry —
CLIs validate against it before building a model so the user sees this
explanation, not a shape/kwarg error.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Mapping

import numpy as np

__all__ = [
    "load_torch_checkpoint",
    "import_torch_state",
    "import_resnet_state",
    "import_mobilenet_v2_state",
    "supported_models",
]


def _np(t: Any) -> np.ndarray:
    """torch.Tensor / array-like -> float32 numpy (no torch import needed)."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def _conv_w(t: Any) -> np.ndarray:
    """OIHW (torch) -> HWIO (qtpu).  Depthwise (C,1,k,k)->(k,k,1,C) is the
    same transpose: torch groups=C conv weight has I/groups==1 in dim 1,
    which lands in qtpu's HWIO dim 2 exactly as ConvBN(groups=C) expects."""
    return np.transpose(_np(t), (2, 3, 1, 0))


class _Importer:
    """Strict two-way-checked copier from a torch state_dict into variables."""

    def __init__(self, state_dict: Mapping[str, Any], variables):
        self.sd = dict(state_dict)
        self.used: set = set()
        # unfreeze without importing flax internals: plain nested dicts
        self.out = {
            col: _to_mutable(variables[col]) for col in variables
        }

    def take(self, key: str, transform: Callable[[Any], np.ndarray] = _np
             ) -> np.ndarray:
        if key not in self.sd:
            raise KeyError(f"checkpoint is missing '{key}'")
        self.used.add(key)
        return transform(self.sd[key])

    def put(self, col: str, path: str, value: np.ndarray) -> None:
        node = self.out[col]
        parts = path.split("/")
        for p in parts[:-1]:
            if p not in node:
                raise KeyError(f"model has no variables at {col}/{path}")
            node = node[p]
        leaf = parts[-1]
        if leaf not in node:
            raise KeyError(f"model has no leaf {col}/{path}")
        # works for arrays and jax.eval_shape's ShapeDtypeStructs alike
        want = getattr(node[leaf], "shape", None)
        if want is None:
            want = np.shape(node[leaf])
        if tuple(want) != tuple(value.shape):
            raise ValueError(
                f"shape mismatch at {col}/{path}: model {tuple(want)} "
                f"vs checkpoint {tuple(value.shape)}")
        node[leaf] = value.astype(np.float32)

    def convbn(self, qtpu_path: str, conv_key: str, bn_key: str) -> None:
        """Map torch `<conv>.weight` + `<bn>.{...}` onto one qtpu ConvBN."""
        self.put("params", f"{qtpu_path}/kernel",
                 self.take(f"{conv_key}.weight", _conv_w))
        if f"{conv_key}.bias" in self.sd:   # torchvision convs are bias-free
            raise ValueError(f"unexpected conv bias at {conv_key}")
        self.put("params", f"{qtpu_path}/scale", self.take(f"{bn_key}.weight"))
        self.put("params", f"{qtpu_path}/bias", self.take(f"{bn_key}.bias"))
        self.put("batch_stats", f"{qtpu_path}/mean",
                 self.take(f"{bn_key}.running_mean"))
        self.put("batch_stats", f"{qtpu_path}/var",
                 self.take(f"{bn_key}.running_var"))

    def dense(self, qtpu_path: str, torch_key: str) -> None:
        self.put("params", f"{qtpu_path}/kernel",
                 self.take(f"{torch_key}.weight",
                           lambda t: np.transpose(_np(t), (1, 0))))
        self.put("params", f"{qtpu_path}/bias", self.take(f"{torch_key}.bias"))

    def finish(self) -> Dict[str, Any]:
        leftover = [k for k in self.sd
                    if k not in self.used
                    and not k.endswith("num_batches_tracked")]
        if leftover:
            raise ValueError(
                f"{len(leftover)} checkpoint tensors were not consumed "
                f"(first: {leftover[:5]}) — architecture/naming mismatch")
        return self.out


def _to_mutable(tree) -> Dict[str, Any]:
    if hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return tree


def load_torch_checkpoint(path: str) -> Dict[str, Any]:
    """`torch.load` a .pth, unwrap common wrappers, strip DDP prefixes."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    return {k[len("module."):] if k.startswith("module.") else k: v
            for k, v in obj.items()}


def import_resnet_state(state_dict: Mapping[str, Any], variables):
    """torchvision ResNet (BasicBlock or Bottleneck) -> qtpu ResNet variables.

    qtpu's Bottleneck already places the stride on the 3x3 conv2
    (qtpu/models/resnet.py), matching torchvision's v1.5 — the mapping is
    purely a rename + layout transpose.  The model structure is derived
    from `variables`, so any stage_sizes/width/cifar_stem combination the
    checkpoint actually matches will import.
    """
    imp = _Importer(state_dict, variables)
    params = variables["params"]
    for name in params:
        if name == "stem":
            imp.convbn("stem", "conv1", "bn1")
        elif name == "fc":
            imp.dense("fc", "fc")
        elif name.startswith("layer"):
            stage, blk = name[len("layer"):].split("_")
            t = f"layer{stage}.{blk}"
            for sub in params[name]:
                if sub == "down":
                    imp.convbn(f"{name}/down",
                               f"{t}.downsample.0", f"{t}.downsample.1")
                else:  # conv1/conv2/conv3
                    k = sub[len("conv"):]
                    imp.convbn(f"{name}/{sub}", f"{t}.conv{k}", f"{t}.bn{k}")
        else:
            raise ValueError(f"unexpected qtpu ResNet module '{name}'")
    return imp.finish()


def import_mobilenet_v2_state(state_dict: Mapping[str, Any], variables):
    """torchvision MobileNetV2 -> qtpu MobileNetV2 variables.

    torchvision block layout: ``features.{i+1}.conv`` is
    [expand ConvBNReLU, dw ConvBNReLU, project Conv2d, project BN] when
    expand_ratio != 1 and [dw ConvBNReLU, project Conv2d, project BN] when
    expand_ratio == 1 (block 0); the presence of qtpu's ``expand`` submodule
    selects between them.  ``features.0`` is the stem, ``features.{N+1}``
    the 1280-wide head, ``classifier.1`` the fc.
    """
    imp = _Importer(state_dict, variables)
    params = variables["params"]
    n_blocks = sum(1 for n in params if n.startswith("block"))
    for name in params:
        if name == "stem":
            imp.convbn("stem", "features.0.0", "features.0.1")
        elif name == "head":
            t = f"features.{n_blocks + 1}"
            imp.convbn("head", f"{t}.0", f"{t}.1")
        elif name == "fc":
            imp.dense("fc", "classifier.1")
        elif name.startswith("block"):
            idx = int(name[len("block"):])
            t = f"features.{idx + 1}.conv"
            if "expand" in params[name]:
                imp.convbn(f"{name}/expand", f"{t}.0.0", f"{t}.0.1")
                imp.convbn(f"{name}/dw", f"{t}.1.0", f"{t}.1.1")
                imp.convbn(f"{name}/project", f"{t}.2", f"{t}.3")
            else:
                imp.convbn(f"{name}/dw", f"{t}.0.0", f"{t}.0.1")
                imp.convbn(f"{name}/project", f"{t}.1", f"{t}.2")
        else:
            raise ValueError(f"unexpected qtpu MobileNetV2 module '{name}'")
    return imp.finish()


_IMPORTERS = {
    "resnet18": import_resnet_state,
    "resnet34": import_resnet_state,
    "resnet50": import_resnet_state,
    "resnet101": import_resnet_state,
    "mobilenet_v2": import_mobilenet_v2_state,
}


def supported_models() -> tuple:
    """Model-registry names with a torch importer (see module docstring for
    why mobilenet_v1/lenet5 are absent)."""
    return tuple(sorted(_IMPORTERS))


def import_torch_state(model_name: str, state_dict: Mapping[str, Any],
                       variables):
    """Dispatch by qtpu model-registry name (see qtpu.models.get_model)."""
    try:
        fn = _IMPORTERS[model_name]
    except KeyError:
        raise ValueError(
            f"no torch importer for '{model_name}' "
            f"(available: {sorted(_IMPORTERS)})") from None
    return fn(state_dict, variables)
