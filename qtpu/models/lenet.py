"""LeNet-5 (MNIST) — BASELINE.json config 1 model.

The reference uses a LeNet-ish MNIST net in its examples (SURVEY.md §1.2 R6
[B][K-high]; mount empty, see SURVEY.md §0).  Built from qtpu.nn quantized
layers; ``quant=None`` gives the fp32 baseline.
"""
from __future__ import annotations

from typing import Optional

import jax
from flax import linen as nn

from qtpu.nn import QuantConv, QuantDense, QuantPolicy


class LeNet5(nn.Module):
    num_classes: int = 10
    quant: Optional[QuantPolicy] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        q = self.quant
        x = QuantConv(6, (5, 5), padding="SAME", quant=q, name="conv1")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = QuantConv(16, (5, 5), padding="VALID", quant=q, name="conv2")(x)
        x = jax.nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        x = QuantDense(120, quant=q, name="fc1")(x)
        x = jax.nn.relu(x)
        x = QuantDense(84, quant=q, name="fc2")(x)
        x = jax.nn.relu(x)
        x = QuantDense(self.num_classes, quant=q, name="fc3")(x)
        return x
