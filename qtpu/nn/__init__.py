"""Quantized NN layer library (Flax modules)."""
from qtpu.nn.act_quant import ActQuant, PARAMS_COL, STATS_COL
from qtpu.nn.config import LayerQuantSpec, QuantMode, QuantPolicy
from qtpu.nn.layers import ConvBN, QuantConv, QuantDense

__all__ = [
    "ActQuant", "ConvBN", "LayerQuantSpec", "PARAMS_COL", "QuantConv",
    "QuantDense", "QuantMode", "QuantPolicy", "STATS_COL",
]
