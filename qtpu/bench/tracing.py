"""Per-layer roofline table from a real device trace (SURVEY.md §5.1).

Round 1 only had aggregate slope-fit numbers; this module captures a
``jax.profiler`` trace on the live chip, parses the Perfetto JSON the TPU
runtime writes (``*.trace.json.gz``), attributes every device op to the
engine's ``annotate()`` scopes (``jax.named_scope`` names appear in the
``tf_op`` metadata), and prints the table the ≥90%-of-roofline target is
judged against: per layer — ms, achieved TOPS, achieved GB/s, and % of the
op's own roofline (ideal time = max(flops/peak, bytes/bandwidth)).

CLI: ``python -m qtpu.bench.tracing [batch]`` builds the flagship ResNet-50
int8 engine and prints its table (run on the TPU; CPU works but measures the
host).  Library: ``capture_trace`` + ``parse_trace`` + ``layer_table``.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import re
from dataclasses import dataclass
from typing import Callable, Dict, List, Optional

from qtpu.bench.timing import V5E_HBM_GBPS, V5E_INT8_OPS


@dataclass
class OpRecord:
    name: str            # HLO instruction name (fusion.3, copy.10, ...)
    scope: str           # named_scope path ("layer1_1"), "" if none
    dur_us: float        # device duration, microseconds
    flops: float         # XLA model_flops
    bytes: float         # bytes_accessed
    category: str        # hlo_category
    source: str          # file:line of the traced-to python op


_SCOPE_RE = re.compile(r"^jit\([^)]*\)/")


def _scope_of(tf_op: str) -> str:
    """Extract the named-scope path from a tf_op string.

    "jit(_forward)/layer1_1/conv_general_dilated:" -> "layer1_1";
    nested scopes keep their path ("layer1_1/sub").
    """
    if not tf_op:
        return ""
    s = _SCOPE_RE.sub("", tf_op.rstrip(":"))
    parts = s.split("/")
    return "/".join(parts[:-1]) if len(parts) > 1 else ""


def parse_trace(path: str) -> List[OpRecord]:
    """Parse device-side XLA Ops out of a ``*.trace.json.gz`` file."""
    opener = gzip.open if path.endswith(".gz") else open
    with opener(path, "rt") as f:
        d = json.load(f)
    ev = d.get("traceEvents", [])
    dev_pids = set()
    op_tids = {}
    for e in ev:
        if e.get("ph") != "M":
            continue
        if (e.get("name") == "process_name"
                and "/device:TPU" in e["args"].get("name", "")):
            dev_pids.add(e["pid"])
        if (e.get("name") == "thread_name"
                and e["args"].get("name") == "XLA Ops"):
            op_tids[(e.get("pid"), e.get("tid"))] = True
    out = []
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        if (e.get("pid"), e.get("tid")) not in op_tids:
            continue
        a = e.get("args", {})
        out.append(OpRecord(
            name=e.get("name", ""),
            scope=_scope_of(a.get("tf_op", "")),
            dur_us=float(e.get("dur", 0.0)),
            flops=float(a.get("model_flops", 0) or 0),
            bytes=float(a.get("bytes_accessed", 0) or 0),
            category=a.get("hlo_category", ""),
            source=a.get("source", ""),
        ))
    return out


def latest_trace_file(logdir: str) -> Optional[str]:
    files = glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                      recursive=True)
    return max(files, key=os.path.getmtime) if files else None


def capture_trace(fn: Callable, *args, steps: int = 10,
                  logdir: str = "/tmp/qtpu_trace") -> Optional[str]:
    """Run ``fn(*args)`` ``steps`` times under the profiler; return the
    trace file path (None if the device trace is unavailable)."""
    import numpy as np

    from qtpu.bench.profile import trace

    fn(*args)                      # warm: compile outside the trace
    with trace(logdir):
        r = None
        for _ in range(steps):
            r = fn(*args)
        import jax
        jax.tree.map(np.asarray, r)  # fetch: await remote execution
    return latest_trace_file(logdir)


def layer_table(records: List[OpRecord], steps: int,
                peak_ops: float = V5E_INT8_OPS,
                peak_bw: float = V5E_HBM_GBPS) -> List[Dict]:
    """Aggregate op records into a per-scope roofline table.

    ``roofline_pct`` is ideal-time/actual-time where ideal =
    max(flops/peak_ops, bytes/peak_bw) summed over the scope's ops — i.e.
    how close the scope runs to its own speed-of-light on this chip.
    """
    agg: Dict[str, Dict] = {}
    for r in records:
        key = r.scope or "(unattributed)"
        row = agg.setdefault(key, dict(scope=key, us=0.0, flops=0.0,
                                       bytes=0.0, ideal_us=0.0, n_ops=0))
        row["us"] += r.dur_us
        row["flops"] += r.flops
        row["bytes"] += r.bytes
        row["ideal_us"] += max(r.flops / peak_ops, r.bytes / peak_bw) * 1e6
        row["n_ops"] += 1
    rows = []
    for row in agg.values():
        us = row["us"] / steps
        rows.append(dict(
            scope=row["scope"],
            us=us,
            n_ops=row["n_ops"] // steps or row["n_ops"],
            tops=row["flops"] / row["us"] / 1e6 if row["us"] else 0.0,
            gbps=row["bytes"] / row["us"] / 1e3 if row["us"] else 0.0,
            roofline_pct=(100.0 * row["ideal_us"] / row["us"]
                          if row["us"] else 0.0),
        ))
    rows.sort(key=lambda r: -r["us"])
    return rows


def format_table(rows: List[Dict], title: str = "") -> str:
    lines = []
    if title:
        lines.append(title)
    lines.append(f"{'scope':<16}{'us/step':>9}{'ops':>5}{'TOPS':>8}"
                 f"{'GB/s':>8}{'%roof':>7}")
    total_us = sum(r["us"] for r in rows)
    total_ideal = sum(r["us"] * r["roofline_pct"] / 100.0 for r in rows)
    for r in rows:
        lines.append(f"{r['scope']:<16}{r['us']:>9.1f}{r['n_ops']:>5d}"
                     f"{r['tops']:>8.1f}{r['gbps']:>8.0f}"
                     f"{r['roofline_pct']:>6.1f}%")
    pct = 100.0 * total_ideal / total_us if total_us else 0.0
    lines.append(f"{'TOTAL':<16}{total_us:>9.1f}{'':>5}{'':>8}{'':>8}"
                 f"{pct:>6.1f}%")
    return "\n".join(lines)


def main() -> int:
    import argparse
    import sys

    import jax

    from qtpu.models import get_model
    from qtpu.nn import QuantPolicy
    from qtpu.transform import calibrate, convert_model, freeze

    ap = argparse.ArgumentParser(
        description="per-layer roofline table from a device trace")
    ap.add_argument("batch", nargs="?", type=int, default=32)
    ap.add_argument("json_out", nargs="?", default=None,
                    help="optional JSON artifact path")
    ap.add_argument("--model", default="resnet50",
                    choices=("resnet50", "mobilenet_v2", "mobilenet_v1"))
    args = ap.parse_args()

    # NOTE: no enable_persistent_cache() here — the JAX compilation-cache key
    # canonicalizes op metadata away, so a cached executable compiled before
    # annotate() scopes were added would be served WITHOUT scope attribution
    # (observed 2026-08-17: tf_op showed no scopes until the cache was
    # bypassed). Profiling runs pay the fresh compile.
    batch = args.batch
    key = jax.random.PRNGKey(0)
    model = (get_model("resnet50", num_classes=1000, cifar_stem=False)
             if args.model == "resnet50"
             else get_model(args.model, num_classes=1000))
    x0 = jax.random.normal(key, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(key, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    if args.model == "resnet50":
        from qtpu.serve.resnet_engine import ResNetInt8Engine

        arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                    cifar_stem=False, num_classes=1000)
        eng = ResNetInt8Engine(sv, arch)
    elif args.model == "mobilenet_v2":
        from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine

        eng = MobileNetV2Int8Engine(sv, num_classes=1000)
    else:
        from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine

        eng = MobileNetV1Int8Engine(sv, num_classes=1000)
    x = jax.random.normal(key, (batch, 224, 224, 3))
    steps = 10
    path = capture_trace(eng.forward, x, steps=steps)
    if path is None:
        print("device trace unavailable", file=sys.stderr)
        return 1
    rows = layer_table(parse_trace(path), steps)
    print(format_table(
        rows, title=f"{args.model} int8 engine, B={batch} ({path})"))
    if args.json_out:
        import json
        with open(args.json_out, "w") as f:
            json.dump(dict(model=args.model, batch=batch, trace=path,
                           rows=rows), f, indent=1)
        print(f"saved {args.json_out}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
