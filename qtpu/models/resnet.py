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


class BasicBlock(nn.Module):
    features: int
    strides: Tuple[int, int] = (1, 1)
    quant: Optional[QuantPolicy] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        residual = x
        y = ConvBN(self.features, (3, 3), self.strides, act=jax.nn.relu,
                   quant=q, name="conv1")(x, train=train)
        y = ConvBN(self.features, (3, 3), quant=q, name="conv2")(y, train=train)
        if residual.shape != y.shape:
            residual = ConvBN(self.features, (1, 1), self.strides, quant=q,
                              name="down")(x, train=train)
        return jax.nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int          # bottleneck width; output is 4*features
    strides: Tuple[int, int] = (1, 1)
    quant: Optional[QuantPolicy] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        out = self.features * 4
        residual = x
        y = ConvBN(self.features, (1, 1), act=jax.nn.relu, quant=q,
                   name="conv1")(x, train=train)
        y = ConvBN(self.features, (3, 3), self.strides, act=jax.nn.relu,
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.quant
        if self.cifar_stem:
            x = ConvBN(self.width, (3, 3), act=jax.nn.relu, quant=q,
                       name="stem")(x, train=train)
        else:
            x = ConvBN(self.width, (7, 7), (2, 2), act=jax.nn.relu, quant=q,
                       name="stem")(x, train=train)
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="SAME")
        for i, n_blocks in enumerate(self.stage_sizes):
            feat = self.width * (2 ** i)
            for j in range(n_blocks):
                strides = (2, 2) if (i > 0 and j == 0) else (1, 1)
                x = self.block(feat, strides, quant=q,
                               name=f"layer{i + 1}_{j}")(x, train=train)
        x = jnp.mean(x, axis=(1, 2))
        return QuantDense(self.num_classes, quant=q, name="fc")(x)


def ResNet18(num_classes: int = 10, cifar_stem: bool = True,
             quant: Optional[QuantPolicy] = None, width: int = 64) -> ResNet:
    return ResNet(block=BasicBlock, stage_sizes=(2, 2, 2, 2), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant)


def ResNet50(num_classes: int = 1000, cifar_stem: bool = False,
             quant: Optional[QuantPolicy] = None, width: int = 64) -> ResNet:
    return ResNet(block=Bottleneck, stage_sizes=(3, 4, 6, 3), width=width,
                  num_classes=num_classes, cifar_stem=cifar_stem, quant=quant)
