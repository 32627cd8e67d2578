"""ResNet int8 engine vs the module SERVE path (CPU, XLA ops only).

The engine's single-grid chaining (one quantization per tensor, reused by
both consumers) deviates from the module path by less than a quantization
step per layer; the assertion is argmax agreement + bounded relative error.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize("bottleneck,symmetric,width,num_classes", [
    (False, False, 64, 10), (True, False, 64, 10),
    # symmetric act grids exercise the engine's ±127 requant path (the one
    # KL-calibrated configs use) — parity with the module SERVE path must
    # hold there too, not just for the affine default.
    (False, True, 64, 10),
    # shape fuzz: non-lane-aligned channels (width 48 -> 48/96/192/384
    # stage channels) and an odd fc width — production checkpoints are not
    # always 128-lane friendly; freeze+engine must not assume alignment.
    (False, False, 48, 7),
    (True, False, 40, 13),
])
def test_engine_matches_module_serve(bottleneck, symmetric, width,
                                     num_classes):
    from qtpu.nn.config import LayerQuantSpec, QuantMode

    name = "resnet50" if bottleneck else "resnet18"
    m = get_model(name, num_classes=num_classes, cifar_stem=True,
                  width=width)
    if bottleneck:  # shrink ResNet-50 for CPU test time
        m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    pol = (QuantPolicy(default=LayerQuantSpec(act_symmetric=True),
                       mode=QuantMode.QUANT)
           if symmetric else QuantPolicy.int8_ptq())
    qm = convert_model(m, pol)
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    tr = jax.jit(lambda v, xx: qm.apply(
        v, xx, train=True, mutable=["batch_stats", "quant_stats"]))
    for i in range(2):
        _, mut = tr(v, jax.random.normal(jax.random.fold_in(KEY, i),
                                         (4, 32, 32, 3)))
        v.update(mut)
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    y_module = jax.jit(sm.apply)(sv, x)

    arch = dict(stage_sizes=(1, 1, 1, 1) if bottleneck else (2, 2, 2, 2),
                width=width, bottleneck=bottleneck, cifar_stem=True,
                num_classes=num_classes)
    eng = ResNetInt8Engine(sv, arch, use_pallas=False)
    y_eng = eng.forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, f"engine deviates too much: rel={rel}"
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


def test_engine_fp32_stem_headline_config():
    """The round-4 headline serving config — int8 with the reference-
    canonical fp32 stem (bench.py, +2.6% e2e receipted in
    scripts/chip_stem_excl_ab.py) — must hold engine/module parity like
    every other config."""
    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    pol = QuantPolicy.int8_ptq(exclude=("stem*",))
    qm = convert_model(m, pol)
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    tr = jax.jit(lambda v, xx: qm.apply(
        v, xx, train=True, mutable=["batch_stats", "quant_stats"]))
    for i in range(2):
        _, mut = tr(v, jax.random.normal(jax.random.fold_in(KEY, i),
                                         (4, 32, 32, 3)))
        v.update(mut)
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    y_module = jax.jit(sm.apply)(sv, x)

    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    eng = ResNetInt8Engine(sv, arch, use_pallas=False)
    y_eng = eng.forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, f"engine deviates too much: rel={rel}"
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


def test_engine_excluded_stem_fc_int4():
    """Config-5 shape: int4 weights, stem*/fc excluded → fp32 inside the
    flat engine (stem BN folded with running stats, fc plain matmul)."""
    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    pol = QuantPolicy.int4_weight_only(exclude=("stem*", "fc"))
    qm = convert_model(m, pol)
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    tr = jax.jit(lambda v, xx: qm.apply(
        v, xx, train=True, mutable=["batch_stats", "quant_stats"]))
    for i in range(2):
        _, mut = tr(v, jax.random.normal(jax.random.fold_in(KEY, i),
                                         (4, 32, 32, 3)))
        v.update(mut)
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    y_module = jax.jit(sm.apply)(sv, x)

    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    eng = ResNetInt8Engine(sv, arch, use_pallas=False)
    with pytest.raises(ValueError):
        eng.stem_grid()          # excluded stem has no int8 ingest grid
    y_eng = eng.forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, f"engine deviates too much: rel={rel}"
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


def test_http_front_serves_predictions():
    """Host RPC front (SURVEY §2.4): npy in -> logits out over HTTP, plus
    /stats and /healthz, batching through the ServingEngine underneath."""
    import io
    import json as _json
    import urllib.request

    from qtpu.parallel import make_mesh
    from qtpu.serve import ServingEngine, serve_http
    from qtpu.transform import calibrate, convert_model, freeze

    m = get_model("lenet5")
    x = jax.random.normal(KEY, (8, 28, 28, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init)(KEY, x))
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    eng = ServingEngine(sm, sv, mesh=make_mesh(dp=1, tp=1,
                                               devices=jax.devices()[:1]),
                        batch_buckets=(4, 8), max_wait_ms=5.0)
    server, _ = serve_http(eng, host="127.0.0.1", port=0, block=False)
    port = server.server_address[1]
    try:
        r = urllib.request.urlopen(f"http://127.0.0.1:{port}/healthz")
        assert _json.loads(r.read())["ok"]
        buf = io.BytesIO()
        np.save(buf, np.asarray(x[:4]))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/predict", data=buf.getvalue(),
            method="POST")
        logits = np.load(io.BytesIO(urllib.request.urlopen(req).read()))
        ref = np.asarray(jax.jit(sm.apply)(sv, x[:4]))
        np.testing.assert_allclose(logits, ref, atol=1e-4, rtol=1e-4)
        stats = _json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats").read())
        assert stats["images"] >= 4
    finally:
        server.shutdown()
        eng.stop()


@pytest.mark.parametrize("exclude", [(), ("stem*",)])
def test_engine_raw_u8_ingest(exclude):
    """forward_u8(raw uint8) == forward((u8/255 - mean)/std): raw 0-255
    pixels on the wire + on-device normalize — the ingest form that
    composes with the EXCLUDED fp32 stem (VERDICT r4 #2), and works for
    quantized stems too."""
    rng = np.random.default_rng(0)
    x8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    mean, std = (0.5, 0.4, 0.45), (0.25, 0.3, 0.2)
    xf = ((x8.astype(np.float32) / 255.0 - np.asarray(mean, np.float32))
          / np.asarray(std, np.float32))
    x = jnp.asarray(xf)
    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq(exclude=exclude))
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    eng = ResNetInt8Engine(sv, arch, normalize=(mean, std))
    y_f32 = np.asarray(eng.forward(x))
    y_u8 = np.asarray(eng.forward_u8(jnp.asarray(x8)))
    assert np.argmax(y_f32, -1).tolist() == np.argmax(y_u8, -1).tolist()
    rel = np.linalg.norm(y_f32 - y_u8) / (np.linalg.norm(y_f32) + 1e-9)
    assert rel < 0.05, rel


def test_engine_codes_vs_raw_u8_parity():
    """Host-quantized int8 codes and raw-u8-with-device-normalize are the
    same request up to quantize rounding (quantized-stem config)."""
    from qtpu.data.native import preprocess_quantize

    rng = np.random.default_rng(1)
    x8 = rng.integers(0, 256, (4, 32, 32, 3), dtype=np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    xf = x8.astype(np.float32) / 255.0
    x = jnp.asarray(xf)
    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    eng = ResNetInt8Engine(sv, arch, normalize=(mean, std))
    s, zp = eng.stem_grid()[:2]
    codes = preprocess_quantize(x8, mean, std, float(s), int(zp))
    y_codes = np.asarray(eng.forward_codes(jnp.asarray(codes)))
    y_u8 = np.asarray(eng.forward_u8(jnp.asarray(x8)))
    assert np.argmax(y_codes, -1).tolist() == np.argmax(y_u8, -1).tolist()
    rel = np.linalg.norm(y_codes - y_u8) / (np.linalg.norm(y_codes) + 1e-9)
    assert rel < 0.05, rel


@pytest.mark.parametrize("model_name,stages,bottleneck", [
    ("resnet34", (1, 1, 1, 1), False),
    ("resnet101", (1, 1, 1, 1), True),
])
def test_engine_resnet34_101_matches_module_serve(model_name, stages,
                                                  bottleneck):
    """The round-5 zoo additions (gluoncv carries resnet34/101 — SURVEY
    §1.2 R6) hold engine/module parity via the same arch-dict engine;
    stage sizes shrunk for CPU test time (block types still exercised)."""
    m = get_model(model_name, num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=stages)
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq(exclude=("stem*",)))
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    y_module = jax.jit(sm.apply)(sv, x)
    arch = dict(stage_sizes=stages, width=64, bottleneck=bottleneck,
                cifar_stem=True, num_classes=10)
    y_eng = ResNetInt8Engine(sv, arch).forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, rel
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


@pytest.mark.parametrize("model_name,stages", [
    ("resnet20", (3, 3, 3)),       # full architecture — small enough on CPU
    ("resnet56", (2, 2, 2)),       # shrunk stage depth (same block/width)
])
def test_engine_cifar_resnet20_56_matches_module_serve(model_name, stages):
    """The gluoncv CIFAR variants (cifar_resnet20/56 — the reference's
    canonical CIFAR-10 example models, SURVEY §1.2 R6) hold engine/module
    parity at their true width-16 geometry, including the width-16 stem →
    16-channel layer1 chain with no downsample in layer1_0."""
    m = get_model(model_name, num_classes=10)
    m = m.clone(stage_sizes=stages)
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    y_module = jax.jit(sm.apply)(sv, x)
    arch = dict(stage_sizes=stages, width=16, bottleneck=False,
                cifar_stem=True, num_classes=10)
    y_eng = ResNetInt8Engine(sv, arch).forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, rel
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


def test_engine_mixed_precision_overrides():
    """Per-layer bit-width OVERRIDES (the reference's per-layer converter
    idiom, SURVEY §2.1 conversion-driver row) flow through freeze into the
    flat engine: int4 weights on one stage, int8 elsewhere, mixed
    packed/unpacked nodes resolved per-node by shape (fused_ops.is_int4)."""
    from qtpu.nn import LayerQuantSpec

    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    pol = QuantPolicy.int8_ptq(
        overrides=(("layer2*", LayerQuantSpec(w_bits=4, a_bits=8)),))
    qm = convert_model(m, pol)
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    # the override actually produced packed int4 on layer2 and int8 elsewhere
    from qtpu.serve.fused_ops import is_int4

    assert is_int4(sv["qweights"]["layer2_0"]["conv1"])
    assert not is_int4(sv["qweights"]["layer1_0"]["conv1"])
    y_module = jax.jit(sm.apply)(sv, x)
    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    y_eng = ResNetInt8Engine(sv, arch).forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, rel
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


def test_engine_raw_u8_ingest_single_channel():
    """u8 ingest on a 1-channel input: the normalize coefficients take
    their channel count from the stats (a hardcoded 3 broadcast (B,H,W,1)
    to (B,H,W,3) and broke the stem conv at trace time)."""
    rng = np.random.default_rng(3)
    x8 = rng.integers(0, 256, (2, 32, 32, 1), dtype=np.uint8)
    mean, std = (0.5,), (0.25,)
    xf = (x8.astype(np.float32) / 255.0 - 0.5) / 0.25
    x = jnp.asarray(xf)
    m = get_model("resnet20", num_classes=10)
    m = m.clone(stage_sizes=(1, 1, 1))
    qm = convert_model(m, QuantPolicy.int8_ptq(exclude=("stem*",)))
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    _, sv = freeze(qm, v, x)
    arch = dict(stage_sizes=(1, 1, 1), width=16, bottleneck=False,
                cifar_stem=True, num_classes=10)
    eng = ResNetInt8Engine(sv, arch, normalize=(mean, std))
    y_f32 = np.asarray(eng.forward(x))
    y_u8 = np.asarray(eng.forward_u8(jnp.asarray(x8)))
    assert y_u8.shape == y_f32.shape
    rel = np.linalg.norm(y_f32 - y_u8) / (np.linalg.norm(y_f32) + 1e-9)
    assert rel < 1e-4, rel


def test_serving_local_rows_dedups_model_replicas():
    """P('data')-sharded outputs are replicated over the 'model' axis: the
    multihost resolve must return each data row-range ONCE (raw shard
    concat handed range-0 logits to range-k clients when tp>1)."""
    from qtpu.parallel import make_mesh
    from qtpu.serve import ServingEngine
    from qtpu.parallel.mesh import batch_sharding

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(dp=4, tp=2, devices=jax.devices()[:8])
    rows = np.arange(8 * 5, dtype=np.float32).reshape(8, 5)
    arr = jax.device_put(jnp.asarray(rows), batch_sharding(mesh))
    assert len(arr.addressable_shards) == 8          # 4 data x 2 model
    out = ServingEngine._local_rows(arr)
    np.testing.assert_array_equal(out, rows)         # once each, in order


def test_engine_per_tensor_weight_scales():
    """per_channel=False freezes SCALAR w_scales; the folded epilogues must
    broadcast them (A0.reshape(n) crashed on every fused serving path)."""
    from qtpu.nn.config import LayerQuantSpec, QuantMode

    m = get_model("resnet50", num_classes=10, cifar_stem=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    pol = QuantPolicy(default=LayerQuantSpec(per_channel=False),
                      mode=QuantMode.QUANT)
    qm = convert_model(m, pol)
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    sm, sv = freeze(qm, v, x)
    assert sv["qweights"]["layer1_0"]["conv1"]["w_scale"].shape == ()
    y_module = jax.jit(sm.apply)(sv, x)
    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=True,
                cifar_stem=True, num_classes=10)
    y_eng = ResNetInt8Engine(sv, arch).forward(x)
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                jnp.linalg.norm(y_module))
    assert rel < 0.10, rel


def test_cifar_resnet_gluoncv_aliases():
    """gluoncv spellings resolve to the same factories (reference-API
    familiarity — the reference's CIFAR examples use these names)."""
    a = get_model("cifar_resnet20_v1", num_classes=10)
    b = get_model("resnet20", num_classes=10)
    assert a.stage_sizes == b.stage_sizes == (3, 3, 3)
    assert a.width == b.width == 16 and a.cifar_stem and b.cifar_stem
    assert get_model("cifar_resnet56_v1").stage_sizes == (9, 9, 9)
