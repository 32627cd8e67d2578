"""Diagnose the qstage bit-exactness failure found by chip_qstage_ab.py.

Round-3 A/B (2026-08-19): subsets "3" bit-exact, "23"/"0123" NOT — some
stage other than layer4 miscompares on real hardware while interpret-mode
tests pass.  Part 1 pins down WHICH stages mismatch on the frozen model;
part 2 reproduces on synthetic chains at the failing geometry, sweeping
chain length and k (images per grid step) to find the minimal trigger.

Usage: python scripts/chip_qstage_debug.py
"""
import sys

sys.path.insert(0, "/root/repo")

from qtpu.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
import numpy as np

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.ops.pallas.qstage import qstage_fused, stage_coeffs
from qtpu.serve.fused_ops import conv_xla, gemm_1x1, grid_of
from qtpu.serve.experimental import \
        ExperimentalResNetInt8Engine as ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def part1() -> None:
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    ref = ResNetInt8Engine(sv, arch)
    y0 = np.asarray(ref.forward(x0))
    for stage in (0, 1, 2, 3):
        eng = ResNetInt8Engine(sv, arch, use_qstage=True,
                               qstage_stages=(stage,))
        y = np.asarray(eng.forward(x0))
        exact = np.array_equal(y0, y)
        md = float(np.max(np.abs(y0 - y)))
        print(f"stage {stage}: bit-exact={exact} maxdiff={md:.6g}",
              flush=True)


def _node(key, kh, kw, ci, co, *, zp, scale):
    k1, k2, k3 = jax.random.split(key, 3)
    w_q = jax.random.randint(k1, (kh, kw, ci, co), -127, 128, jnp.int8)
    return {
        "kernel_q": w_q,
        "w_scale": jax.random.uniform(k2, (co,), jnp.float32, 0.002, 0.02),
        "colsum": jnp.sum(w_q.astype(jnp.int32), axis=(0, 1, 2)),
        "bias": jax.random.normal(k3, (co,), jnp.float32) * 0.1,
        "act_scale": jnp.float32(scale),
        "act_zp": jnp.int32(zp),
    }


def _chain(key, nblk, cin, cmid):
    blocks = []
    for i in range(nblk):
        ks = jax.random.split(jax.random.fold_in(key, i), 3)
        blocks.append((
            _node(ks[0], 1, 1, cin, cmid, zp=5 - i, scale=0.021 + 0.002 * i),
            _node(ks[1], 3, 3, cmid, cmid, zp=-17 + i, scale=0.013),
            _node(ks[2], 1, 1, cmid, cin, zp=9, scale=0.017 - 0.001 * i)))
    return blocks


def _ref_chain(x_q, blocks, next_grid):
    for i, (c1, c2, c3) in enumerate(blocks):
        tgt = (grid_of(blocks[i + 1][0])[:2] if i + 1 < len(blocks)
               else next_grid)
        a = gemm_1x1(x_q, c1, relu=True, requant=grid_of(c2),
                     out_dtype=jnp.int8, use_pallas=False)
        b = conv_xla(a, c2, strides=(1, 1), relu=True, requant=grid_of(c3))
        x_q = gemm_1x1(b, c3, relu=True, requant=tgt, out_dtype=jnp.int8,
                       residual=x_q, res_grid=grid_of(c1), use_pallas=False)
    return x_q


def _stacked(blocks):
    cin = blocks[0][0]["kernel_q"].shape[-2]
    cmid = blocks[0][0]["kernel_q"].shape[-1]
    return dict(
        w1=jnp.stack([c1["kernel_q"].reshape(cin, cmid)
                      for c1, _, _ in blocks]),
        w2=jnp.concatenate([c2["kernel_q"].reshape(9, cmid, cmid)
                            for _, c2, _ in blocks]),
        w3=jnp.stack([c3["kernel_q"].reshape(cmid, cin)
                      for _, _, c3 in blocks]))


def part2() -> None:
    B = 8
    for name, H, cin, cmid, nblk_max in [
            ("layer4", 7, 2048, 512, 2),
            ("layer3", 14, 1024, 256, 5),
            ("layer2", 28, 512, 128, 2),
            ("layer1", 56, 256, 64, 2)]:
        for nblk in (1, nblk_max):
            blocks = _chain(jax.random.fold_in(KEY, 13 + nblk), nblk, cin,
                            cmid)
            ng = (jnp.float32(0.019), jnp.int32(-3))
            x = jax.random.randint(jax.random.fold_in(KEY, 77),
                                   (B, H, H, cin), -128, 128, jnp.int8)
            ref = np.asarray(_ref_chain(x, blocks, ng)).reshape(-1, cin)
            kwargs = dict(**_stacked(blocks), **stage_coeffs(blocks, ng),
                          h=H, w=H)
            for k in (1, 2, 4, 8):
                if (k * H * H) > 4096 or B % k or (k * H * H) % 8:
                    continue
                out = np.asarray(qstage_fused(
                    x.reshape(B * H * H, cin), k=k, **kwargs))
                bad = int(np.sum(out != ref))
                md = int(np.max(np.abs(out.astype(np.int32)
                                       - ref.astype(np.int32))))
                line = (f"{name} nblk={nblk} k={k}: mismatches={bad}"
                        f"/{ref.size} maxdiff={md}")
                if bad:
                    # interpret mode ON THE SAME DEVICE: separates a Mosaic
                    # codegen bug (interp==ref, compiled!=ref) from a kernel
                    # math bug (interp==compiled!=ref)
                    oi = np.asarray(qstage_fused(
                        x.reshape(B * H * H, cin), k=k, interpret=True,
                        **kwargs))
                    bad_i = int(np.sum(oi != ref))
                    bad_ic = int(np.sum(oi != out))
                    line += f" | interp-vs-ref={bad_i} interp-vs-compiled={bad_ic}"
                print(line, flush=True)


def part3() -> None:
    """Real frozen nodes + random input codes: engine._qstage vs the
    per-block XLA sequence, isolated per stage (no stem/head)."""
    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    eng = ResNetInt8Engine(sv, arch, use_qstage=True)
    sizes = arch["stage_sizes"]
    geoms = [(56, 256), (28, 512), (14, 1024), (7, 2048)]
    for stage, n in enumerate(sizes):
        H, cin = geoms[stage]
        blocks = [tuple(eng._node(f"layer{stage + 1}_{j}", k)
                        for k in ("conv1", "conv2", "conv3"))
                  for j in range(1, n)]
        if stage + 1 < len(sizes):
            tgt_node = eng._node(f"layer{stage + 2}_0", "conv1")
        else:
            tgt_node = eng._node("fc")
        ng = grid_of(tgt_node)[:2]
        zps = [int(c["act_zp"]) for blk in blocks for c in blk]
        print(f"stage {stage}: act_zps={zps} tgt_zp={int(ng[1])}",
              flush=True)
        x = jax.random.randint(jax.random.fold_in(KEY, 5),
                               (8, H, H, cin), -128, 128, jnp.int8)
        ref = np.asarray(_ref_chain(x, blocks, ng)).reshape(-1, cin)
        out = np.asarray(eng._qstage(x, stage)[0]).reshape(-1, cin)
        bad = int(np.sum(out != ref))
        md = int(np.max(np.abs(out.astype(np.int32) - ref.astype(np.int32))))
        print(f"stage {stage}: qstage-vs-blocks mismatches={bad}/{ref.size} "
              f"maxdiff={md}", flush=True)


def part4() -> None:
    """Walk the REAL forward path stage by stage: run both engines' block
    dispatch on the same real stage-input codes, compare codes after every
    stage AND after the head, to locate where the e2e divergence enters."""
    from qtpu.serve.resnet_engine import _grid_of

    model = get_model("resnet50", num_classes=1000, cifar_stem=False)
    x0 = jax.random.normal(KEY, (8, 224, 224, 3))
    qm = convert_model(model, QuantPolicy.int8_ptq())
    qv = jax.jit(qm.init, static_argnames="train")(KEY, x0, train=True)
    qv = calibrate(qm, dict(qv), [x0])
    _, sv = freeze(qm, qv, x0)
    arch = dict(stage_sizes=(3, 4, 6, 3), width=64, bottleneck=True,
                cifar_stem=False, num_classes=1000)
    ref = ResNetInt8Engine(sv, arch)
    eng = ResNetInt8Engine(sv, arch, use_qstage=True)

    names = ref._block_names()
    first = ref._node(names[0][0], "conv1")
    fc = ref._node("fc")
    x_q = ref._stem(x0, _grid_of(first))
    grid = _grid_of(first)
    sizes = arch["stage_sizes"]
    idx = 0
    for i, n in enumerate(sizes):
        # projection block (shared per-block path in both engines)
        strides = (2, 2) if i > 0 else (1, 1)
        nxt = _grid_of(ref._node(f"layer{i + 1}_1", "conv1"))
        x_q = ref._bottleneck(x_q, grid, f"layer{i + 1}_0", strides, nxt)
        grid = nxt
        idx += 1
        # identity run: per-block (ref) vs chained kernel (eng)
        xa = x_q
        ga = grid
        for j in range(1, n):
            if idx + 1 < len(names):
                nxt2 = _grid_of(ref._node(names[idx + 1][0], "conv1"))
            else:
                nxt2 = _grid_of(fc)
            xa = ref._bottleneck(xa, ga, f"layer{i + 1}_{j}", (1, 1), nxt2)
            ga = nxt2
            idx += 1
        xb, gb = eng._qstage(x_q, i)
        ba = np.asarray(xa)
        bb = np.asarray(xb)
        bad = int(np.sum(ba != bb))
        md = int(np.max(np.abs(ba.astype(np.int32) - bb.astype(np.int32))))
        print(f"stage {i}: REAL-path codes mismatches={bad}/{ba.size} "
              f"maxdiff={md} grids_equal="
              f"{[float(ga[0]) == float(gb[0]), int(ga[1]) == int(gb[1])]}",
              flush=True)
        x_q, grid = xa, ga
    # head on the agreed codes
    y_ref = np.asarray(ref.forward(x0))
    y_eng = np.asarray(eng.forward(x0))
    print("full fwd maxdiff:", float(np.max(np.abs(y_ref - y_eng))),
          " logits scale:", float(np.max(np.abs(y_ref))), flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "123"
    if "1" in which:
        part1()
    if "2" in which:
        part2()
    if "3" in which:
        part3()
    if "4" in which:
        part4()
