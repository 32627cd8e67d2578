"""HTTP front hardening: body-size cap (413) and unhealthy-engine 503.

VERDICT r3 weak #3: the launchable server must not buffer unbounded POST
bodies and must surface a dead engine as a server error (503), not a
client error (400).  Uses a fake engine — no jax, pure http.server.
"""
import io
import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from qtpu.serve.http_front import serve_http


class FakeEngine:
    def __init__(self, healthy=True):
        self.healthy = healthy

    def predict(self, arr):
        if not self.healthy:
            raise RuntimeError("engine stopped")
        return np.zeros((arr.shape[0], 10), np.float32)

    def stats(self):
        return {"images": 0.0}


def _serve(engine, **kw):
    server, thread = serve_http(engine, host="127.0.0.1", port=0,
                                block=False, **kw)
    port = server.server_address[1]
    return server, f"http://127.0.0.1:{port}"


def _post(url, body, timeout=30):
    return urllib.request.urlopen(url + "/predict", body, timeout=timeout)


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_predict_ok_and_stats():
    server, url = _serve(FakeEngine())
    try:
        r = _post(url, _npy_bytes(np.zeros((2, 4, 4, 1), np.float32)))
        assert r.status == 200
        out = np.load(io.BytesIO(r.read()))
        assert out.shape == (2, 10)
    finally:
        server.shutdown()


def test_oversized_body_413_without_buffering():
    server, url = _serve(FakeEngine(), max_body_bytes=1024)
    try:
        # Claim a huge body via Content-Length; the server must reject from
        # the header alone (it never reads the body, so sending only a few
        # bytes with a large declared length still gets the 413).
        req = urllib.request.Request(
            url + "/predict", data=b"x" * 16,
            headers={"Content-Length": str(1 << 30)})
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30)
        assert ei.value.code == 413
        err = json.loads(ei.value.read())
        assert "exceeds" in err["error"]
    finally:
        server.shutdown()


def test_oversized_body_drained_clean_413():
    """A mildly-oversized body (≤4x limit) is drained chunk-wise so the
    client gets the 413 instead of a broken pipe mid-send."""
    server, url = _serve(FakeEngine(), max_body_bytes=4096)
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, b"y" * 8192)
        assert ei.value.code == 413
    finally:
        server.shutdown()


def test_body_under_limit_accepted():
    server, url = _serve(FakeEngine(), max_body_bytes=1 << 20)
    try:
        r = _post(url, _npy_bytes(np.zeros((1, 8, 8, 1), np.float32)))
        assert r.status == 200
    finally:
        server.shutdown()


def test_unhealthy_engine_503_on_predict_and_healthz():
    server, url = _serve(FakeEngine(healthy=False))
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, _npy_bytes(np.zeros((1, 4, 4, 1), np.float32)))
        assert ei.value.code == 503
        with pytest.raises(urllib.error.HTTPError) as eh:
            urllib.request.urlopen(url + "/healthz", timeout=30)
        assert eh.value.code == 503
    finally:
        server.shutdown()


def test_engine_dies_mid_request_503():
    class DiesOnPredict(FakeEngine):
        def predict(self, arr):
            self.healthy = False
            raise RuntimeError("scheduler crashed")

    server, url = _serve(DiesOnPredict())
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, _npy_bytes(np.zeros((1, 4, 4, 1), np.float32)))
        assert ei.value.code == 503
    finally:
        server.shutdown()


def test_client_error_still_400():
    server, url = _serve(FakeEngine())
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(url, b"not an npy payload")
        assert ei.value.code == 400
    finally:
        server.shutdown()


def test_bad_content_length_header_400():
    """A non-numeric Content-Length must get a 400 response, not an
    uncaught ValueError that drops the connection with no reply."""
    import http.client

    server, url = _serve(FakeEngine())
    try:
        host = url.split("//")[1]
        conn = http.client.HTTPConnection(host, timeout=30)
        conn.putrequest("POST", "/predict", skip_accept_encoding=True)
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
        conn.close()
    finally:
        server.shutdown()


def test_malformed_request_400_engine_survives():
    """A real engine: one client's wrong-shape/wrong-dtype request gets a
    400 (submit-time validation) and the engine KEEPS SERVING — before the
    round-5 hardening a bad image reached the packed round and could kill
    the scheduler (every later client then saw 503)."""
    import jax
    import jax.numpy as jnp

    from qtpu.parallel import make_mesh
    from qtpu.serve import ServingEngine

    eng = ServingEngine(None, {}, mesh=make_mesh(dp=1, tp=1,
                                                 devices=jax.devices()[:1]),
                        batch_buckets=(4,), max_wait_ms=1.0,
                        forward_fn=lambda _v, x: jnp.sum(x, axis=(1, 2)))
    server, url = _serve(eng)
    try:
        good = _npy_bytes(np.zeros((2, 4, 4, 1), np.float32))
        assert _post(url, good).status == 200
        with pytest.raises(urllib.error.HTTPError) as ei:   # wrong shape
            _post(url, _npy_bytes(np.zeros((2, 4, 5, 1), np.float32)))
        assert ei.value.code == 400
        assert "shape" in json.loads(ei.value.read())["error"]
        # f64 -> f32 is a same_kind cast: accepted, not rejected
        r = _post(url, _npy_bytes(np.zeros((2, 4, 4, 1), np.float64) + 0.5))
        assert r.status == 200
        assert eng.healthy
        assert _post(url, good).status == 200               # still serving
    finally:
        server.shutdown()
        eng.stop()


def test_metrics_prometheus_format():
    """/metrics exposes engine stats in Prometheus text exposition format
    with TYPE lines and a health gauge (SURVEY §5.5 observability)."""
    eng = FakeEngine()
    eng.stats = lambda: {"images": 42.0, "p50_ms": 1.5}
    server, base = _serve(eng)
    try:
        r = urllib.request.urlopen(base + "/metrics", timeout=30)
        assert r.headers["Content-Type"].startswith("text/plain")
        body = r.read().decode()
        assert "# TYPE qtpu_serving_images counter" in body
        assert "qtpu_serving_images 42" in body
        assert "# TYPE qtpu_serving_p50_ms gauge" in body
        assert "qtpu_serving_p50_ms 1.5" in body
        assert "qtpu_serving_healthy 1" in body
        eng.healthy = False
        body = urllib.request.urlopen(base + "/metrics",
                                      timeout=30).read().decode()
        assert "qtpu_serving_healthy 0" in body
    finally:
        server.shutdown()
