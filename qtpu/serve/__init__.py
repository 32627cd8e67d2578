"""Sharded int8/int4 serving runtime with continuous batching."""
from qtpu.serve.engine import ServingEngine
from qtpu.serve.http_front import serve_http

__all__ = ["ServingEngine", "serve_http"]
