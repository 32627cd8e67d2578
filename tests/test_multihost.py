"""Multi-host serving: two real OS processes over the gloo CPU backend.

Proves the north-star phrase "continuous batching across hosts" [B] with an
actual multi-process SPMD run (SURVEY.md SS5.8 `jax.distributed.initialize`):
each process owns half the (data=2, model=2) mesh, receives its own
requests, and the engines' lockstep schedulers serve them through one
TP-sharded integer forward.  Also covers the overlap-flag helper.
"""
import os
import subprocess
import sys

import pytest

from qtpu.parallel.distributed import OVERLAP_XLA_FLAGS, enable_overlap_flags

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(ROOT, "tests", "multihost_worker.py")


def test_two_process_serving():
    port = 23557
    procs = []
    for pid in range(2):
        env = dict(os.environ)
        env.update({
            "QTPU_COORDINATOR": f"localhost:{port}",
            "QTPU_NUM_PROCESSES": "2",
            "QTPU_PROCESS_ID": str(pid),
            "JAX_NUM_CPU_DEVICES": "2",
            # workers set their own platform/opt flags
            "XLA_FLAGS": "",
            "JAX_PLATFORMS": "cpu",
        })
        procs.append(subprocess.Popen(
            [sys.executable, WORKER], env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=560)
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out}"
        assert "WORKER_OK 4" in out, f"proc {pid} output:\n{out}"


def test_overlap_flags_idempotent(monkeypatch):
    # flags ride LIBTPU_INIT_ARGS: --xla_tpu_* inside XLA_FLAGS fatally
    # aborts the client flag parser on this libtpu (distributed.py note)
    monkeypatch.setenv("LIBTPU_INIT_ARGS", "--some_user_flag=1")
    monkeypatch.setenv("XLA_FLAGS", "--xla_foo=1")
    enable_overlap_flags()
    first = os.environ["LIBTPU_INIT_ARGS"]
    assert all(f.split("=")[0] in first for f in OVERLAP_XLA_FLAGS)
    assert all(f.split("=")[0] not in os.environ["XLA_FLAGS"]
               for f in OVERLAP_XLA_FLAGS)
    enable_overlap_flags()
    assert os.environ["LIBTPU_INIT_ARGS"] == first      # no duplication
    assert "--some_user_flag=1" in first                # user flags preserved
