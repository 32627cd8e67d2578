"""Trace parser + roofline table (qtpu.bench.tracing) on a synthetic trace.

The on-chip path is exercised by ``python -m qtpu.bench.tracing``; here we
check the parsing/attribution/aggregation math against a hand-built Perfetto
JSON in the exact shape the TPU runtime writes (device pid metadata, XLA Ops
thread, tf_op scope strings).
"""
import gzip
import json

from qtpu.bench.tracing import (_scope_of, format_table, latest_trace_file,
                                layer_table, parse_trace)


def _write_trace(tmp_path):
    ev = [
        {"ph": "M", "pid": 3, "name": "process_name",
         "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 2, "name": "thread_name",
         "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name",
         "args": {"name": "/host:CPU"}},
        {"ph": "M", "pid": 9, "tid": 1, "name": "thread_name",
         "args": {"name": "python"}},
        # stem conv: 100us, 394e6 flops (ideal 1us compute), 81.9e3 bytes
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.1", "dur": 100.0,
         "args": {"tf_op": "jit(_forward)/stem/conv_general_dilated:",
                  "model_flops": "394000000", "bytes_accessed": "81900",
                  "hlo_category": "convolution fusion",
                  "source": "qtpu/ops/qops.py:58"}},
        # layer1_1: two ops of 50us each
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.2", "dur": 50.0,
         "args": {"tf_op": "jit(_forward)/layer1_1/conv_general_dilated:",
                  "model_flops": "0", "bytes_accessed": "40950000"}},
        {"ph": "X", "pid": 3, "tid": 2, "name": "fusion.3", "dur": 50.0,
         "args": {"tf_op": "jit(_forward)/layer1_1/add:",
                  "model_flops": "0", "bytes_accessed": "0"}},
        # unattributed copy
        {"ph": "X", "pid": 3, "tid": 2, "name": "copy.1", "dur": 10.0,
         "args": {"tf_op": "jit(_forward)/copy:",
                  "hlo_category": "data formatting"}},
        # host-side event must be ignored
        {"ph": "X", "pid": 9, "tid": 1, "name": "hostop", "dur": 9999.0,
         "args": {}},
    ]
    p = tmp_path / "demo.trace.json.gz"
    with gzip.open(p, "wt") as f:
        json.dump({"traceEvents": ev}, f)
    return str(p)


def test_scope_extraction():
    assert _scope_of("jit(_forward)/stem/conv_general_dilated:") == "stem"
    assert _scope_of("jit(_forward)/layer1_1/sub/add:") == "layer1_1/sub"
    assert _scope_of("jit(_forward)/convert:") == ""
    assert _scope_of("") == ""


def test_parse_and_table(tmp_path):
    path = _write_trace(tmp_path)
    assert latest_trace_file(str(tmp_path)) == path
    recs = parse_trace(path)
    assert len(recs) == 4                      # host event dropped
    assert {r.scope for r in recs} == {"stem", "layer1_1", ""}

    rows = layer_table(recs, steps=1)
    by = {r["scope"]: r for r in rows}
    # stem: 100us, 394e6 flops -> 3.94 TOPS; ideal = max(1us, 0.1us) = 1us
    assert abs(by["stem"]["tops"] - 3.94) < 1e-6
    assert abs(by["stem"]["roofline_pct"] - 1.0) < 1e-6
    # layer1_1: 100us total, 40.95MB -> 409.5 GB/s, ideal 50us -> 50%
    l1 = by["layer1_1"]
    assert abs(l1["gbps"] - 409.5) < 1e-6
    assert abs(l1["roofline_pct"] - 50.0) < 1e-6
    assert by["(unattributed)"]["us"] == 10.0
    # sorted by descending time; total row renders
    assert rows[0]["us"] == 100.0
    txt = format_table(rows)
    assert "TOTAL" in txt and "stem" in txt
