"""Per-conv-shape kernel-roofline table (VERDICT r3 #2).

The >=90%-of-roofline kernel receipt existed only for 4096^3 GEMM
(91-96%, scripts/chip_qmatmul_tile_sweep.py).  This script measures, for
every DISTINCT conv shape in ResNet-50 + MobileNet-v1/v2 at the serving
operating point (B=128, 224^2), the best STANDALONE implementation as a
percent of that shape's own max(compute, bytes) roofline:

* 1x1 convs:  XLA NHWC conv + folded epilogue (the engine path) vs the
  Pallas fused 2-D GEMM (qmatmul_fused) where lanes allow;
* KxK convs:  XLA int8 conv + folded epilogue; the Pallas candidates have
  standing measured verdicts (3-D blocked forms lose 2-5x to Mosaic
  relayouts, im2col loses on lane-poor Ci — round-1/2 receipts), so the
  XLA number IS the best-known standalone for conv shapes unless noted;
* depthwise:  XLA grouped conv vs the shifted elementwise-FMA form
  (qops.qdepthwise_shifted; the Pallas depthwise kernel's measured
  verdict is in PARITY.md).

Every implementation requants to int8 on an affine grid (the serving
form).  Slope-fit scan timing per shape with a FULL-dependency feedback:
the int8 output feeds the next iteration's input directly when shapes
match (stride-1, Ci==Co — zero harness overhead), else through a minimal
all-elements-consumed transform (channel group-sum / tile, 2x2 nearest
upsample for strided shapes) whose extra traffic is accounted in the
harness-inclusive ideal.  A partial dependency (one output byte via
dynamic-update-slice) is NOT enough the other way: XLA cannot slice-sink
through it, but the extra full-reduce + carry-copy fusions serialize
against the conv and sink fast shapes 3x (measured on l1c2 3x3/64:
597us sum+DUS vs 194us direct feed, 2026-08-20 A/B).

Usage: python scripts/chip_conv_shape_roofline.py [B] [model,model,...] \
           [--resume LOG]
Prints one table row per distinct shape and a JSON line per row.
--resume LOG skips shapes whose JSON rows already appear in LOG (the
tunnel occasionally wedges mid-sweep; rows are independent).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.bench.timing import V5E_HBM_GBPS, V5E_INT8_OPS, time_scan_fit
from qtpu.serve.fused_ops import conv_xla, gemm_1x1

KEY = jax.random.PRNGKey(0)


def enum_resnet50(B):
    """(label, K, stride, H, W, Ci, Co, groups) for every distinct conv."""
    shapes = [("stem 7x7/2", 7, 2, 224, 224, 3, 64, 1)]
    h = 56
    cin = 64
    for i, n in enumerate((3, 4, 6, 3)):
        w = 64 * (2 ** i)
        out = 4 * w
        s = 1 if i == 0 else 2
        hin = h * s                     # projection block input res
        shapes += [
            (f"l{i+1} c1 1x1 {cin}->{w}", 1, 1, hin, hin, cin, w, 1),
            (f"l{i+1} c2 3x3/{s} {w}", 3, s, hin, hin, w, w, 1),
            (f"l{i+1} c3 1x1 {w}->{out}", 1, 1, h, h, w, out, 1),
            (f"l{i+1} down 1x1/{s} {cin}->{out}", 1, s, hin, hin, cin, out, 1),
            (f"l{i+1} id c1 1x1 {out}->{w}", 1, 1, h, h, out, w, 1),
            (f"l{i+1} id c2 3x3 {w}", 3, 1, h, h, w, w, 1),
        ]
        cin = out
        h //= 2
    return shapes


def enum_mobilenet_v2(B):
    shapes = [("stem 3x3/2 3->32", 3, 2, 224, 224, 3, 32, 1)]
    cfg = ((1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
           (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1))
    h, cin = 112, 32
    for t, c, n, s in cfg:
        for j in range(n):
            stride = s if j == 0 else 1
            hid = cin * t
            if t != 1:
                shapes.append((f"exp 1x1 {cin}->{hid}@{h}",
                               1, 1, h, h, cin, hid, 1))
            shapes.append((f"dw 3x3/{stride} {hid}@{h}",
                           3, stride, h, h, hid, hid, hid))
            ho = h // stride
            shapes.append((f"proj 1x1 {hid}->{c}@{ho}",
                           1, 1, ho, ho, hid, c, 1))
            h, cin = ho, c
    shapes.append((f"head 1x1 {cin}->1280@{h}", 1, 1, h, h, cin, 1280, 1))
    return shapes


def enum_mobilenet_v1(B):
    shapes = [("stem 3x3/2 3->32", 3, 2, 224, 224, 3, 32, 1)]
    cfg = [(64, 1), (128, 2), (128, 1), (256, 2), (256, 1), (512, 2),
           (512, 1), (512, 1), (512, 1), (512, 1), (512, 1), (1024, 2),
           (1024, 1)]
    h, cin = 112, 32
    for c, s in cfg:
        shapes.append((f"dw 3x3/{s} {cin}@{h}", 3, s, h, h, cin, cin, cin))
        ho = h // s
        shapes.append((f"pw 1x1 {cin}->{c}@{ho}", 1, 1, ho, ho, cin, c, 1))
        h, cin = ho, c
    return shapes


def make_node(key, K, ci, co, groups):
    """Synthetic frozen qweights node (affine act grid, per-channel w)."""
    k1, k2 = jax.random.split(key)
    w = jax.random.randint(k1, (K, K, ci // groups, co), -127, 128, jnp.int8)
    return dict(
        kernel_q=w,
        colsum=jnp.sum(w.astype(jnp.int32), axis=(0, 1, 2)),
        w_scale=jax.random.uniform(k2, (co,), jnp.float32, 0.005, 0.02),
        bias=jnp.zeros((co,), jnp.float32),
        act_scale=jnp.float32(0.02), act_zp=jnp.int32(3), act_sym=False)


REQUANT = (jnp.float32(0.05), jnp.int32(2), False)


def _descramble(y):
    """Break structural value-equalities so XLA cannot algebra-fold the
    feedback into the next conv's constant weights.

    Tile/broadcast/upsample are LINEAR constant maps G, and conv(G.y)
    folds into conv'(y) with pre-summed weights at compile time — measured
    up to 1306% "of roofline" on proj 1x1 384->96 before this guard.  An
    elementwise min against a per-element iota-derived constant pattern is
    nonlinear and makes every expanded element distinct-valued, so no
    group of input channels/pixels is provably equal.  One VPU op, fused
    into the producer; values land in [96,127] so real data is unchanged.
    """
    _, H, W, C = y.shape
    pat = ((jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 0) * 7
            + jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 1) * 13
            + jax.lax.broadcasted_iota(jnp.int32, (H, W, C), 2) * 3) % 32
           + 96).astype(jnp.int8)
    return jnp.minimum(y, pat)


def feedback(out, in_shape):
    """Map the conv output to the next iteration's input with a FULL data
    dependency (every output element consumed) at minimal extra traffic.

    Identity-shaped outputs feed back directly (zero overhead).  Channel
    mismatches reduce by group-sum (Co = k*Ci) or tile (Ci = k*Co), else
    sum-all + broadcast; strided outputs upsample by nearest-neighbour
    repeat; all non-direct paths pass through _descramble so the expansion
    cannot be compile-time-folded.  Extra traffic = one output read + one
    carry write, charged to the harness-inclusive ideal (pct_incl_harness).
    """
    B, H, W, Ci = in_shape
    _, OH, OW, Co = out.shape
    y = out
    if Co != Ci:
        if Co % Ci == 0:
            y = (y.astype(jnp.int32).reshape(B, OH, OW, Co // Ci, Ci)
                 .sum(3).astype(jnp.int8))
        elif Ci % Co == 0:
            y = jnp.tile(y, (1, 1, 1, Ci // Co))
        else:
            s = y.astype(jnp.int32).sum(-1, keepdims=True).astype(jnp.int8)
            y = jnp.broadcast_to(s, (B, OH, OW, Ci))
    if (OH, OW) != (H, W):
        rh, rw = -(-H // OH), -(-W // OW)
        y = jnp.repeat(jnp.repeat(y, rh, axis=1), rw, axis=2)[:, :H, :W]
    if y is not out:
        y = _descramble(y)
    return y


def chain_bodies(impl, shape, out_shape):
    """Applicable scan bodies, name -> body.

    Direct-feed shapes (out == in) need only the zero-overhead feedback.
    Others also try the sum+DUS fallback: full-output reduce folded into
    one carry byte.  It is slower for most shapes (the extra reduce +
    carry-copy fusions serialize against the conv), but it keeps the
    conv's INPUT buffer pristine — for some shapes the synthesized-input
    feedback perturbs XLA's layout/fusion choice around the conv and
    measures slower (l1 c3: 2505us feedback vs 688us sumdus), so each
    shape takes the min over harnesses: any harness is an upper bound on
    the op's standalone time.
    """
    bodies = {"feedback": lambda c: feedback(impl(c), shape)}
    if shape != out_shape:
        def sumdus(c):
            out = impl(c)
            dep = jnp.sum(out.astype(jnp.int32)).astype(c.dtype)
            cf = jax.lax.dynamic_update_slice(c.reshape(-1), dep[None], (0,))
            return cf.reshape(c.shape)

        bodies["sumdus"] = sumdus
    return bodies


def measure(B, label, K, s, H, W, Ci, Co, groups, seed=0):
    node = make_node(jax.random.fold_in(KEY, seed), K, Ci, Co, groups)
    x = jax.random.randint(KEY, (B, H, W, Ci), -100, 100, jnp.int8)
    OH, OW = -(-H // s), -(-W // s)
    M = B * OH * OW
    ops = 2.0 * M * K * K * (Ci // groups) * Co
    bytes_ = B * H * W * Ci + M * Co + K * K * (Ci // groups) * Co
    t_ideal = max(ops / V5E_INT8_OPS, bytes_ / V5E_HBM_GBPS)
    # harness traffic (see feedback): zero when the output feeds back
    # directly, else one output read + one carry write.
    direct = (s == 1 and Ci == Co and groups in (1, Ci))
    extra = 0 if direct else M * Co + B * H * W * Ci
    t_ideal_h = max(ops / V5E_INT8_OPS, (bytes_ + extra) / V5E_HBM_GBPS)

    cands = {}
    if groups > 1:
        cands["xla-grouped"] = lambda c: conv_xla(
            c, node, strides=(s, s), groups=Ci, relu=True, requant=REQUANT)
        cands["shifted"] = lambda c: conv_xla(
            c, node, strides=(s, s), groups=Ci, relu=True, requant=REQUANT,
            dw_shifted=True)
    elif K == 1 and s == 1:
        cands["xla"] = lambda c: gemm_1x1(
            c, node, relu=True, requant=REQUANT, out_dtype=jnp.int8,
            use_pallas=False)
        if M % 32 == 0 and Co % 32 == 0 and Ci % 64 == 0:
            cands["pallas-gemm"] = lambda c: gemm_1x1(
                c, node, relu=True, requant=REQUANT, out_dtype=jnp.int8,
                use_pallas=True, min_ci_pallas=64)
    else:
        cands["xla"] = lambda c: conv_xla(
            c, node, strides=(s, s), relu=True, requant=REQUANT)

    # ideal-scaled chain lengths: the marginal (n_long - n_short) chain must
    # dwarf the ~25ms launch overhead + run-to-run noise, or tiny shapes
    # (<=10us ideal) fit slope on noise (measured: a 7x7x160 conv "timed"
    # 0.0us/iter with a 60-iter margin).
    n_diff = int(min(max(25e-3 / max(4 * t_ideal, 2e-6), 40), 1500))
    n_short = max(8, n_diff // 4)
    n_long = n_short + n_diff
    results = {}
    in_shape = (B, H, W, Ci)
    out_shape = (B, OH, OW, Co)
    for name, impl in cands.items():
        for hname, body in chain_bodies(impl, in_shape, out_shape).items():
            key = f"{name}+{hname}"
            try:
                t = time_scan_fit(body, x, n_short=n_short, n_long=n_long,
                                  reps=2)
            except Exception as e:                  # noqa: BLE001
                results[key] = (None, f"{type(e).__name__}")
                continue
            results[key] = (t, None)

    best_name, best_t = None, float("inf")
    for name, (t, err) in results.items():
        if t is not None and t < best_t:
            best_name, best_t = name, t
    pct = 100.0 * t_ideal / best_t if best_name else 0.0
    row = dict(label=label, K=K, stride=s, H=H, W=W, Ci=Ci, Co=Co,
               groups=groups, ops=ops, bytes=bytes_,
               t_ideal_us=round(t_ideal * 1e6, 2),
               best=best_name, t_us=round(best_t * 1e6, 2),
               pct_of_roofline=round(pct, 1),
               pct_incl_harness=round(100.0 * t_ideal_h / best_t, 1)
               if best_name else 0.0,
               tops=round(ops / best_t / 1e12, 1),
               gbps=round(bytes_ / best_t / 1e9, 1),
               all={k: (round(v[0] * 1e6, 2) if v[0] else v[1])
                    for k, v in results.items()})
    print(f"{label:34s} ideal {t_ideal*1e6:8.1f}us  best {best_name or '-':12s} "
          f"{best_t*1e6:8.1f}us  {pct:5.1f}%  "
          f"{row['tops']:6.1f} TOPS {row['gbps']:6.1f} GB/s", flush=True)
    print("JSON " + json.dumps(row), flush=True)
    return row


def main() -> int:
    args = sys.argv[1:]
    resume_path = None
    if "--resume" in args:
        i = args.index("--resume")
        resume_path = args[i + 1]
        args = args[:i] + args[i + 2:]
    argv = [a for a in args if not a.startswith("--")]
    B = int(argv[0]) if argv else 128
    models = (argv[1].split(",") if len(argv) > 1
              else ["resnet50", "mobilenet_v2", "mobilenet_v1"])
    enum = dict(resnet50=enum_resnet50, mobilenet_v2=enum_mobilenet_v2,
                mobilenet_v1=enum_mobilenet_v1)
    seen = set()
    rows = []
    if resume_path:
        path = resume_path
        if os.path.exists(path):
            for line in open(path):
                if line.startswith("JSON "):
                    r = json.loads(line[5:])
                    seen.add((r["K"], r["stride"], r["H"], r["W"],
                              r["Ci"], r["Co"], r["groups"]))
                    rows.append(r)
            print(f"resume: {len(seen)} shapes already done in {path}",
                  flush=True)
    for m in models:
        print(f"== {m} @ B={B} ==", flush=True)
        for shape in enum[m](B):
            key = shape[1:]
            if key in seen:
                continue
            seen.add(key)
            rows.append(measure(B, *shape, seed=len(seen)))
    n90 = sum(1 for r in rows if r["pct_of_roofline"] >= 90)
    print(f"\n{n90}/{len(rows)} distinct shapes at >=90% of their own "
          f"max(compute,bytes) roofline", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
