"""qtpu — TPU-native quantized CNN framework.

From-scratch rebuild of hey-yahei/Quantization.MXNet's capabilities as an
idiomatic JAX/XLA/Pallas stack: fake-quant simulation (INT8/INT4, per-tensor/
per-channel), min-max/EMA/KL calibration, BN folding, STE-based QAT, integer
serving with Pallas kernels, and a sharded multi-host serving runtime.
See SURVEY.md for the structural map and provenance notes.
"""
__version__ = "0.1.0"

from qtpu.nn import LayerQuantSpec, QuantMode, QuantPolicy       # noqa: F401
from qtpu.transform import (calibrate, convert_model, freeze,     # noqa: F401
                            set_mode, strip_quant)
