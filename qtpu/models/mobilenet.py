"""MobileNet-v1 / v2 with quantized depthwise-separable convolutions.

Covers the reference's MobileNet model-zoo targets (SURVEY.md §1.2 R6 [B]) —
MobileNet-v2 is BASELINE.json config 3 (INT8 QAT, depthwise-conv quant path).
The depthwise convs use ``groups=channels`` through qtpu.nn.ConvBN, which maps
to ``feature_group_count`` in XLA and to the dedicated depthwise Pallas kernel
on the serving path (SURVEY.md §2.2).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qtpu.nn import ConvBN, QuantDense, QuantPolicy


def relu6(x):
    return jnp.minimum(jax.nn.relu(x), 6.0)


def _round_ch(ch: float, divisor: int = 8) -> int:
    """Round channel counts like the original MobileNet width-multiplier rule."""
    new = max(divisor, int(ch + divisor / 2) // divisor * divisor)
    if new < 0.9 * ch:
        new += divisor
    return new


def _pad3(torch_pad: bool):
    """3x3-conv padding: explicit (1,1) under torch geometry, else SAME.

    Identical for stride 1; for stride 2 torch pads (1,1) where XLA's SAME
    pads (0,1) — explicit padding keeps imported torch checkpoints
    spatially faithful (see qtpu/data/import_torch.py)."""
    return ((1, 1), (1, 1)) if torch_pad else "SAME"


class DWSeparable(nn.Module):
    """Depthwise 3x3 + pointwise 1x1 (MobileNet-v1 block)."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    quant: Optional[QuantPolicy] = None
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        c = x.shape[-1]
        x = ConvBN(c, (3, 3), self.strides, padding=_pad3(self.torch_pad),
                   groups=c, act=jax.nn.relu,
                   quant=q, name="dw")(x, train=train)
        x = ConvBN(self.features, (1, 1), act=jax.nn.relu, quant=q,
                   name="pw")(x, train=train)
        return x


class MobileNetV1(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    quant: Optional[QuantPolicy] = None
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        w = lambda c: _round_ch(c * self.width_mult)
        x = ConvBN(w(32), (3, 3), (2, 2), padding=_pad3(self.torch_pad),
                   act=jax.nn.relu, quant=q,
                   name="stem")(x, train=train)
        cfg = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
               (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
               (1024, 1)]
        for i, (c, s) in enumerate(cfg):
            x = DWSeparable(w(c), (s, s), quant=q, torch_pad=self.torch_pad,
                            name=f"block{i}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=q, name="fc")(x)


class InvertedResidual(nn.Module):
    """MobileNet-v2 inverted residual: expand 1x1 → depthwise 3x3 → project 1x1."""

    features: int
    strides: Tuple[int, int] = (1, 1)
    expand: int = 6
    quant: Optional[QuantPolicy] = None
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        c_in = x.shape[-1]
        hidden = c_in * self.expand
        y = x
        if self.expand != 1:
            y = ConvBN(hidden, (1, 1), act=relu6, quant=q,
                       name="expand")(y, train=train)
        y = ConvBN(hidden, (3, 3), self.strides, padding=_pad3(self.torch_pad),
                   groups=hidden, act=relu6,
                   quant=q, name="dw")(y, train=train)
        y = ConvBN(self.features, (1, 1), quant=q,
                   name="project")(y, train=train)
        if self.strides == (1, 1) and c_in == self.features:
            y = y + x
        return y


class MobileNetV2(nn.Module):
    num_classes: int = 1000
    width_mult: float = 1.0
    quant: Optional[QuantPolicy] = None
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        w = lambda c: _round_ch(c * self.width_mult)
        x = ConvBN(w(32), (3, 3), (2, 2), padding=_pad3(self.torch_pad),
                   act=relu6, quant=q,
                   name="stem")(x, train=train)
        # (expand, out_ch, repeats, stride) — standard v2 schedule
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        idx = 0
        for t, c, n, s in cfg:
            for j in range(n):
                stride = s if j == 0 else 1
                x = InvertedResidual(w(c), (stride, stride), expand=t, quant=q,
                                     torch_pad=self.torch_pad,
                                     name=f"block{idx}")(x, train=train)
                idx += 1
        x = ConvBN(w(1280) if self.width_mult > 1.0 else 1280, (1, 1),
                   act=relu6, quant=q, name="head")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=q, name="fc")(x)
