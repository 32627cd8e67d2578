"""ResNets (CIFAR + ImageNet variants) built from quantized ConvBN blocks.

Covers the reference's gluoncv model-zoo usage (SURVEY.md §1.2 R6: ResNet +
cifar variants [B][K-high]; mount empty, §0) — rebuilt in Flax since no model
zoo is available offline (SURVEY.md §1.3 N7 [E]).  ResNet-18 (BasicBlock) for
BASELINE.json config 2 (CIFAR-10) and ResNet-50 (Bottleneck) for configs 4/5.

Layer naming is stable ("stem", "layer{i}_{j}/convK", "fc") so QuantPolicy
exclude/override globs address layers predictably — e.g. the canonical
first/last-layer exclusion is ``exclude=("stem*", "fc")``.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from qtpu.nn import ConvBN, QuantDense, QuantPolicy


def _pad3(torch_pad: bool):
    """3x3-conv padding: explicit (1,1) under torch geometry, else SAME.

    Identical for stride 1; for stride 2 torch pads symmetrically where
    XLA's SAME pads (0,1) — explicit padding keeps imported torchvision
    checkpoints spatially faithful (see qtpu/data/import_torch.py).
    """
    return ((1, 1), (1, 1)) if torch_pad else "SAME"


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    quant: Optional[QuantPolicy] = None
    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        pad = _pad3(self.torch_pad)
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, padding=pad,
                   act=jax.nn.relu, quant=q, name="conv1")(x, train=train)
        y = ConvBN(self.features, (3, 3), padding=pad, quant=q,
                   name="conv2")(y, train=train)
        if residual.shape != y.shape:
            residual = ConvBN(self.features, (1, 1), self.strides, quant=q,
                              name="down")(x, train=train)
        return jax.nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4*features
    strides: Tuple[int, int] = (1, 1)
    quant: Optional[QuantPolicy] = None

    torch_pad: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        out = self.features * 4
        residual = x
        y = ConvBN(self.features, (1, 1), act=jax.nn.relu, quant=q,
                   name="conv1")(x, train=train)
        y = ConvBN(self.features, (3, 3), self.strides,
                   padding=_pad3(self.torch_pad), act=jax.nn.relu,
                   quant=q, name="conv2")(y, train=train)
        y = ConvBN(out, (1, 1), quant=q, name="conv3")(y, train=train)
        if residual.shape != y.shape:
            residual = ConvBN(out, (1, 1), self.strides, quant=q,
                              name="down")(x, train=train)
        return jax.nn.relu(y + residual)


class ResNet(nn.Module):
    """Generic ResNet over NHWC inputs.

    ``cifar_stem=True`` uses the 3x3/1 stem without max-pool (cifar_resnet
    style); otherwise the ImageNet 7x7/2 stem + 3x3/2 max-pool.
    """

    block: type
    stage_sizes: Sequence[int]
    num_classes: int = 10
    width: int = 64
    cifar_stem: bool = False
    quant: Optional[QuantPolicy] = None
    torch_pad: bool = False  # torchvision geometry (see import_torch.py)

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        if self.cifar_stem:
            x = ConvBN(self.width, (3, 3), padding=_pad3(self.torch_pad),
                       act=jax.nn.relu, quant=q, name="stem")(x, train=train)
        else:
            stem_pad = ((3, 3), (3, 3)) if self.torch_pad else "SAME"
            pool_pad = ((1, 1), (1, 1)) if self.torch_pad else "SAME"
            x = ConvBN(self.width, (7, 7), (2, 2), padding=stem_pad,
                       act=jax.nn.relu, quant=q, name="stem")(x, train=train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=pool_pad)
        for i, n_blocks in enumerate(self.stage_sizes):
            feat = self.width * (2 ** i)
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = self.block(feat, strides, quant=q,
                               torch_pad=self.torch_pad,
                               name=f"layer{i + 1}_{j}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=q, name="fc")(x)


def ResNet18(num_classes: int = 10, cifar_stem: bool = True,
             quant: Optional[QuantPolicy] = None, width: int = 64,
             torch_pad: bool = False) -> ResNet:
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant,
                  torch_pad=torch_pad)


def ResNet20(num_classes: int = 10, cifar_stem: bool = True,
             quant: Optional[QuantPolicy] = None, width: int = 16,
             torch_pad: bool = False) -> ResNet:
    """BasicBlock (3, 3, 3) at width 16 — the gluoncv ``cifar_resnet20``
    architecture (3x3/1 stem -> stages 16/32/64), the reference's canonical
    CIFAR-10 example model (SURVEY.md §1.2 R6 "cifar variants")."""
    return ResNet(block=BasicBlock, stage_sizes=(3, 3, 3), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant,
                  torch_pad=torch_pad)


def ResNet56(num_classes: int = 10, cifar_stem: bool = True,
             quant: Optional[QuantPolicy] = None, width: int = 16,
             torch_pad: bool = False) -> ResNet:
    """BasicBlock (9, 9, 9) at width 16 — gluoncv ``cifar_resnet56``."""
    return ResNet(block=BasicBlock, stage_sizes=(9, 9, 9), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant,
                  torch_pad=torch_pad)


def ResNet34(num_classes: int = 1000, cifar_stem: bool = False,
             quant: Optional[QuantPolicy] = None, width: int = 64,
             torch_pad: bool = False) -> ResNet:
    """BasicBlock (3, 4, 6, 3) — the gluoncv/torchvision resnet34."""
    return ResNet(block=BasicBlock, stage_sizes=(3, 4, 6, 3), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant,
                  torch_pad=torch_pad)


def ResNet50(num_classes: int = 1000, cifar_stem: bool = False,
             quant: Optional[QuantPolicy] = None, width: int = 64,
             torch_pad: bool = False) -> ResNet:
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant,
                  torch_pad=torch_pad)


def ResNet101(num_classes: int = 1000, cifar_stem: bool = False,
              quant: Optional[QuantPolicy] = None, width: int = 64,
              torch_pad: bool = False) -> ResNet:
    """Bottleneck (3, 4, 23, 3) — the gluoncv/torchvision resnet101."""
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 23, 3), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant,
                  torch_pad=torch_pad)
