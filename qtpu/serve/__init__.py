"""Sharded int8/int4 serving runtime with continuous batching."""
from qtpu.serve.engine import ServingEngine

__all__ = ["ServingEngine"]
