"""Host RPC front for the serving engine (SURVEY.md §2.4 qtpu/serve row).

A minimal, dependency-free HTTP frontend over :class:`qtpu.serve.ServingEngine`
— the piece that turns the continuous-batching scheduler into a network
service.  stdlib ``http.server`` only (no egress/install in this
environment); one process per host, the engine underneath handles the mesh
(including multi-host lockstep serving — engine docstring).

Protocol (numpy ``.npy`` bytes on the wire — self-describing dtype/shape,
zero deps on either side):

* ``POST /predict`` — body: one ``.npy`` array of images, (B, H, W, C) or a
  single (H, W, C) image.  Response: ``.npy`` array of logits.  uint8
  arrays work as-is on u8-ingest engines (npy is self-describing).
* ``GET /stats``    — engine metrics as JSON (images/sec, p50/p99, occupancy).
* ``GET /metrics``  — the same metrics in Prometheus text exposition format
  (``qtpu_serving_*`` gauges/counters + ``qtpu_serving_healthy``), so a
  standard scraper can watch a fleet without a qtpu-aware exporter.
* ``GET /healthz``  — 200 while the engine scheduler is live; 503 after a
  scheduler crash or stop (``ServingEngine.healthy``).

Client sketch::

    buf = io.BytesIO(); np.save(buf, images)
    r = urllib.request.urlopen("http://host:8000/predict", buf.getvalue())
    logits = np.load(io.BytesIO(r.read()))

Requests are submitted per-image into the engine's queue, so concurrent
HTTP clients batch together through the continuous-batching scheduler —
the RPC layer adds no batching policy of its own.
"""
from __future__ import annotations

import io
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional, Tuple

import numpy as np


DEFAULT_MAX_BODY_BYTES = 256 << 20   # 256 MiB ≈ B=1024 of 224² f32 images


class _Handler(BaseHTTPRequestHandler):
    engine = None                     # set by serve_http
    max_body_bytes = DEFAULT_MAX_BODY_BYTES   # set by serve_http
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):   # quiet by default
        pass

    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        if self.close_connection:
            self.send_header("Connection", "close")
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def do_GET(self):
        if self.path == "/healthz":
            ok = getattr(self.engine, "healthy", True)
            self._send_json(200 if ok else 503, {"ok": bool(ok)})
        elif self.path == "/stats":
            self._send_json(200, {k: float(v)
                                  for k, v in self.engine.stats().items()})
        elif self.path == "/metrics":
            # Prometheus text exposition format, version 0.0.4: one
            # qtpu_serving_<stat> line per engine stat + a health gauge.
            # Counters (monotonic) vs gauges chosen per stat semantics.
            counters = {"images", "batches"}
            lines = []
            for k, v in self.engine.stats().items():
                name = f"qtpu_serving_{k}"
                kind = "counter" if k in counters else "gauge"
                lines.append(f"# TYPE {name} {kind}")
                lines.append(f"{name} {float(v):g}")
            lines.append("# TYPE qtpu_serving_healthy gauge")
            lines.append("qtpu_serving_healthy "
                         f"{int(bool(getattr(self.engine, 'healthy', True)))}")
            self._send(200, ("\n".join(lines) + "\n").encode(),
                       "text/plain; version=0.0.4")
        else:
            self._send_json(404, {"error": f"no route {self.path}"})

    def do_POST(self):
        if self.path != "/predict":
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        # Reject before buffering: an unbounded Content-Length read would let
        # one oversized request OOM the serving host.  Mildly-oversized bodies
        # are drained in bounded chunks so the client receives the 413 (an
        # immediate close surfaces as a broken pipe mid-send); absurd ones
        # (>4x the limit) just close.
        try:
            n = int(self.headers.get("Content-Length", "0"))
        except ValueError:
            self.close_connection = True
            self._send_json(400, {"error": "invalid Content-Length header"})
            return
        if n > self.max_body_bytes:
            self.close_connection = True
            if n <= 4 * self.max_body_bytes:
                left = n
                while left > 0:
                    chunk = self.rfile.read(min(left, 1 << 20))
                    if not chunk:
                        break
                    left -= len(chunk)
            self._send_json(413, {"error": f"body {n} bytes exceeds limit "
                                           f"{self.max_body_bytes}"})
            return
        if not getattr(self.engine, "healthy", True):
            self.close_connection = True
            self._send_json(503, {"error": "engine stopped or unhealthy"})
            return
        try:
            arr = np.load(io.BytesIO(self.rfile.read(n)), allow_pickle=False)
            if arr.ndim == 3:
                arr = arr[None]
            logits = self.engine.predict(np.ascontiguousarray(arr))
            buf = io.BytesIO()
            np.save(buf, np.asarray(logits))
            self._send(200, buf.getvalue(), "application/octet-stream")
        except Exception as e:  # surface engine/deser errors to the client
            # An engine that died mid-request is a server condition (503),
            # not a client error (400).
            if not getattr(self.engine, "healthy", True):
                self._send_json(503, {"error": str(e)})
            else:
                self._send_json(400, {"error": str(e)})


def serve_http(engine, host: str = "0.0.0.0", port: int = 8000,
               block: bool = True,
               max_body_bytes: int = DEFAULT_MAX_BODY_BYTES
               ) -> Tuple[ThreadingHTTPServer, Optional[threading.Thread]]:
    """Serve ``engine`` over HTTP; returns (server, thread).

    ``block=False`` runs the server on a daemon thread (tests/embedding);
    call ``server.shutdown()`` to stop.  The engine's own scheduler thread
    keeps batching across concurrent requests either way.
    ``max_body_bytes`` caps POST bodies (oversized requests get 413 without
    being buffered).
    """
    handler = type("BoundHandler", (_Handler,),
                   {"engine": engine, "max_body_bytes": int(max_body_bytes)})
    server = ThreadingHTTPServer((host, port), handler)
    if block:
        server.serve_forever()
        return server, None
    t = threading.Thread(target=server.serve_forever, daemon=True,
                         name="qtpu-http-front")
    t.start()
    return server, t
