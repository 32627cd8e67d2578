"""Serve CLI (python -m qtpu.serve): end-to-end HTTP + int8-ingest parity.

Covers the launchable-server assembly (overlap flags → bring-up → freeze →
mesh → engine → HTTP) and the uint8→int8-codes ingest path (4x smaller
transfer), which must match the f32 ingest bit-for-bit on argmax.
"""
import dataclasses
import io
import os
import subprocess
import sys
import time
import urllib.request

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _post_npy(url, arr, timeout=120):
    buf = io.BytesIO()
    np.save(buf, arr)
    r = urllib.request.urlopen(url, buf.getvalue(), timeout=timeout)
    return np.load(io.BytesIO(r.read()))


def test_cli_serves_http_end_to_end():
    env = dict(os.environ)
    # Force CPU: the harness env carries JAX_PLATFORMS=axon (remote TPU);
    # honor_platform_env in the CLI honors whatever this var says.
    env["JAX_PLATFORMS"] = "cpu"
    env["JAX_NUM_CPU_DEVICES"] = "2"
    env["XLA_FLAGS"] = ("--xla_backend_optimization_level=0 "
                        "--xla_llvm_disable_expensive_passes=true")
    # --port 0: the OS picks a free port (no fixed-port collisions across
    # concurrent test runs); the READY line reports the bound port.
    proc = subprocess.Popen(
        [sys.executable, "-m", "qtpu.serve", "--config", "lenet_mnist_int8",
         "--port", "0", "--buckets", "2,4", "--max-wait-ms", "20"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, env=env,
        cwd=ROOT)
    try:
        ready, lines = False, []
        t0 = time.time()
        while time.time() - t0 < 300:
            line = proc.stdout.readline()
            if not line:
                break
            lines.append(line)
            if line.startswith("QTPU_SERVE_READY"):
                ready = True
                break
        assert ready, "server never became ready:\n" + "".join(lines)
        import json as _json

        port = _json.loads(lines[-1][len("QTPU_SERVE_READY "):])["port"]
        imgs = np.random.default_rng(0).normal(
            size=(4, 28, 28, 1)).astype(np.float32)
        logits = _post_npy(f"http://127.0.0.1:{port}/predict", imgs)
        assert logits.shape == (4, 10)
        h = urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz",
                                   timeout=30)
        assert h.status == 200
        s = urllib.request.urlopen(f"http://127.0.0.1:{port}/stats",
                                   timeout=30)
        import json

        stats = json.loads(s.read())
        assert stats["images"] >= 4
    finally:
        proc.terminate()
        assert proc.wait(timeout=120) == 0


def test_uint8_ingest_matches_f32_path():
    """build_engine(uint8_ingest=True): uint8 wire → int8 codes → same
    predictions as the f32 flat-engine path (same frozen weights: same
    config + seed is a deterministic build)."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = dataclasses.replace(
        CONFIGS["resnet18_cifar10_int8_kl"],
        n_train=256, n_eval=64, calib_batches=2, batch_size=32)
    x8 = np.random.default_rng(1).integers(0, 256, (4, 32, 32, 3),
                                           dtype=np.uint8)
    eng_u8, info_u8 = build_engine(cfg, buckets=(4,), uint8_ingest=True,
                                   max_wait_ms=50.0)
    assert info_u8["serve_path"] == "flat-engine+int8-ingest"
    assert info_u8["raw_dtype"] == "uint8"
    try:
        y_codes = eng_u8.predict(x8)
    finally:
        eng_u8.stop()

    eng_f32, info_f32 = build_engine(cfg, buckets=(4,), uint8_ingest=False,
                                     max_wait_ms=50.0)
    assert info_f32["serve_path"] == "flat-engine"
    try:
        y_f32 = eng_f32.predict(x8.astype(np.float32) / 255.0)
    finally:
        eng_f32.stop()

    np.testing.assert_allclose(y_codes, y_f32, atol=1e-4)
    assert (y_codes.argmax(-1) == y_f32.argmax(-1)).all()


def test_wedged_peer_round_timeout(tmp_path):
    """Multi-host lockstep with one wedged peer: the healthy host's round
    watchdog fails in-flight futures and flips healthy=False instead of
    hanging forever (VERDICT r2 weak #6)."""
    port = 23561
    worker = os.path.join(ROOT, "tests", "multihost_worker.py")
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "QTPU_COORDINATOR": f"localhost:{port}",
            "QTPU_NUM_PROCESSES": "2",
            "QTPU_PROCESS_ID": str(pid),
            "JAX_NUM_CPU_DEVICES": "2",
            "XLA_FLAGS": "",
            "JAX_PLATFORMS": "cpu",
            "QTPU_TEST_WEDGE": "1",
            "QTPU_TEST_WEDGE_SENTINEL": str(tmp_path / "wedge_ok"),
        })
        procs.append(subprocess.Popen(
            [sys.executable, worker], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=560)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
    assert "WORKER_WEDGE_OK" in outs[0], outs[0]


@pytest.mark.parametrize("config_name", ["mobilenetv2_imagenet_int8_qat",
                                         "mobilenetv1_imagenet_int8_ptq"])
def test_uint8_ingest_mobilenet_matches_f32_path(config_name):
    """MobileNet engines also take int8-code ingest (round 3): uint8 wire →
    stem-grid codes → same predictions as the f32 flat-engine path."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = dataclasses.replace(
        CONFIGS[config_name],
        image_size=64, n_train=8, calib_batches=1, batch_size=4)
    x8 = np.random.default_rng(3).integers(0, 256, (4, 64, 64, 3),
                                           dtype=np.uint8)
    eng_u8, info_u8 = build_engine(cfg, buckets=(4,), uint8_ingest=True,
                                   max_wait_ms=50.0)
    assert info_u8["serve_path"] == "flat-engine+int8-ingest"
    try:
        y_codes = eng_u8.predict(x8)
    finally:
        eng_u8.stop()

    eng_f32, _ = build_engine(cfg, buckets=(4,), uint8_ingest=False,
                              max_wait_ms=50.0)
    try:
        y_f32 = eng_f32.predict(x8.astype(np.float32) / 255.0)
    finally:
        eng_f32.stop()

    np.testing.assert_allclose(y_codes, y_f32, atol=1e-4)
    assert (y_codes.argmax(-1) == y_f32.argmax(-1)).all()


def test_save_frozen_load_frozen_roundtrip(tmp_path):
    """The freeze-once-serve-many flow: --save-frozen writes the integer
    weights; a fresh --load-frozen engine (no calibration pass) serves the
    same predictions."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = dataclasses.replace(
        CONFIGS["lenet_mnist_int8"], n_train=64, calib_batches=2,
        batch_size=16)
    frozen = str(tmp_path / "frozen")
    x = np.random.default_rng(5).normal(size=(4, 28, 28, 1)).astype(
        np.float32)

    eng_a, _ = build_engine(cfg, buckets=(4,), max_wait_ms=50.0,
                            save_frozen=frozen)
    try:
        y_a = eng_a.predict(x)
    finally:
        eng_a.stop()

    eng_b, _ = build_engine(cfg, buckets=(4,), max_wait_ms=50.0,
                            load_frozen=frozen)
    try:
        y_b = eng_b.predict(x)
    finally:
        eng_b.stop()

    np.testing.assert_allclose(y_a, y_b, atol=1e-5)


def test_uint8_ingest_rejected_for_module_path():
    """--uint8-ingest requires a stem-grid flat engine; the module SERVE
    path (e.g. LeNet) must fail fast, not silently mis-serve."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    with pytest.raises(SystemExit, match="flat-engine"):
        build_engine(CONFIGS["lenet_mnist_int8"], uint8_ingest=True)


def test_uint8_ingest_composes_with_excluded_stem():
    """Round 5 (VERDICT r4 #2): the fp32-stem recommended config ACCEPTS
    uint8 ingest — raw 0-255 pixels cross the wire (4x less transfer) and
    are normalized on device before the fp32 stem (no ingest grid needed).
    Predictions match the f32-image path."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = dataclasses.replace(
        CONFIGS["resnet50_imagenet_int8_ptq_fp32stem"],
        image_size=32, num_classes=10, width=16, n_train=8,
        calib_batches=1, batch_size=4)
    x8 = np.random.default_rng(5).integers(0, 256, (4, 32, 32, 3),
                                           dtype=np.uint8)
    eng_u8, info_u8 = build_engine(cfg, buckets=(4,), uint8_ingest=True,
                                   max_wait_ms=50.0)
    assert info_u8["serve_path"] == "flat-engine+u8-ingest"
    assert info_u8["raw_dtype"] == "uint8"
    try:
        y_u8 = eng_u8.predict(x8)
    finally:
        eng_u8.stop()

    eng_f32, _ = build_engine(cfg, buckets=(4,), uint8_ingest=False,
                              max_wait_ms=50.0)
    try:
        y_f32 = eng_f32.predict(x8.astype(np.float32) / 255.0)
    finally:
        eng_f32.stop()

    # same math up to one fused normalize reassociation (codes flip only at
    # exact round-half ties)
    assert (y_u8.argmax(-1) == y_f32.argmax(-1)).all()
    rel = (np.linalg.norm(y_u8 - y_f32)
           / (np.linalg.norm(y_f32) + 1e-9))
    assert rel < 0.05, rel


def test_build_engine_fp32_stem_flat_path():
    """The recommended fp32-stem config reaches the flat-engine path (its
    stem*/fc exclusions are engine-supported; round-4 dispatch rule)."""
    import dataclasses

    from qtpu.examples.configs import CONFIGS

    import numpy as np

    cfg = dataclasses.replace(
        CONFIGS["resnet50_imagenet_int8_ptq_fp32stem"],
        image_size=32, num_classes=10, width=16, n_train=8,
        calib_batches=1, batch_size=4)
    from qtpu.serve.cli import build_engine

    engine, meta = build_engine(cfg, buckets=(2,), max_wait_ms=0.5)
    try:
        assert meta["serve_path"] == "flat-engine", meta
        x = np.random.default_rng(0).normal(
            size=(2, 32, 32, 3)).astype(np.float32)
        y = engine.predict(x)
        assert y.shape == (2, cfg.num_classes)
    finally:
        engine.stop()


def test_build_engine_mobilenet_flat_path():
    """MobileNet configs serve through their flat int8 engines."""
    import dataclasses

    import numpy as np

    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = dataclasses.replace(
        CONFIGS["mobilenetv2_imagenet_int8_qat"],
        image_size=64, n_train=8, calib_batches=1, batch_size=4)
    eng, info = build_engine(cfg, buckets=(2,), max_wait_ms=0.5)
    try:
        assert info["serve_path"] == "flat-engine"
        x = np.random.default_rng(0).normal(
            size=(2, 64, 64, 3)).astype(np.float32)
        y = eng.predict(x)
        assert y.shape == (2, cfg.num_classes)
    finally:
        eng.stop()


def test_uint8_wire_over_http_fp32_stem():
    """Raw uint8 npy arrays POST through the HTTP front into the u8-ingest
    engine (fp32-stem config): the full wire path of the round-5 ingest
    composition — npy is self-describing, so no protocol change needed."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine
    from qtpu.serve.http_front import serve_http

    cfg = dataclasses.replace(
        CONFIGS["resnet50_imagenet_int8_ptq_fp32stem"],
        image_size=32, num_classes=10, width=16, n_train=8,
        calib_batches=1, batch_size=4)
    eng, info = build_engine(cfg, buckets=(4,), uint8_ingest=True,
                             max_wait_ms=50.0)
    assert info["serve_path"] == "flat-engine+u8-ingest"
    server, _ = serve_http(eng, host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    try:
        x8 = np.random.default_rng(7).integers(0, 256, (4, 32, 32, 3),
                                               dtype=np.uint8)
        logits = _post_npy(f"http://127.0.0.1:{port}/predict", x8)
        assert logits.shape == (4, 10)
        ref = eng.predict(x8)
        np.testing.assert_allclose(logits, ref, atol=1e-4, rtol=1e-4)
    finally:
        server.shutdown()
        eng.stop()
