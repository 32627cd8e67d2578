"""Flat int8 engines under torchvision (torch_pad) geometry.

VERDICT r3 #1: imported torch checkpoints must reach the fast serving path.
The flat engines now take the same ``torch_pad`` flag as the models
(explicit symmetric pads on the 7x7 stem / 3x3 max-pool / strided 3x3
convs where XLA SAME pads (0,1)); these tests pin

* module-SERVE vs flat-engine parity on torch_pad models for all three
  engine families (ResNet bottleneck+basic ImageNet stem, MobileNet v1/v2),
* that the flag is load-bearing: running SAME geometry over torch_pad
  frozen weights visibly diverges (the round-3 silent-wrong-results bug),
* the serve CLI end-to-end: ``build_engine(torch_ckpt=...)`` reports
  serve_path=flat-engine and its predictions match the module path.
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


def _freeze_model(m, x, n_stats: int = 2):
    qm = convert_model(m, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    tr = jax.jit(lambda v, xx: qm.apply(
        v, xx, train=True, mutable=["batch_stats", "quant_stats"]))
    for i in range(n_stats):
        _, mut = tr(v, jax.random.normal(jax.random.fold_in(KEY, i), x.shape))
        v.update(mut)
    v = calibrate(qm, v, [x])
    return freeze(qm, v, x)


def _assert_parity(y_eng, y_module, rel_tol=0.15):
    rel = float(jnp.linalg.norm(y_eng - y_module) /
                (float(jnp.linalg.norm(y_module)) + 1e-9))
    assert rel < rel_tol, f"engine deviates: rel={rel}"
    agree = float(jnp.mean(jnp.argmax(y_eng, -1) == jnp.argmax(y_module, -1)))
    assert agree == 1.0


@pytest.mark.parametrize("bottleneck", [True, False])
def test_resnet_engine_torch_pad_matches_module(bottleneck):
    """ImageNet stem (7x7/2 + pool/2) + strided stages under torch pads."""
    name = "resnet50" if bottleneck else "resnet18"
    m = get_model(name, num_classes=10, cifar_stem=False, torch_pad=True)
    m = m.clone(stage_sizes=(1, 1, 1, 1))
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    sm, sv = _freeze_model(m, x)
    y_module = jax.jit(sm.apply)(sv, x)

    arch = dict(stage_sizes=(1, 1, 1, 1), width=64, bottleneck=bottleneck,
                cifar_stem=False, num_classes=10, torch_pad=True)
    eng = ResNetInt8Engine(sv, arch)
    y_eng = eng.forward(x)
    _assert_parity(y_eng, y_module)

    # The flag is load-bearing: SAME geometry over the same frozen weights
    # must NOT match (this is the silent-wrong-serving bug of round 3).
    wrong = ResNetInt8Engine(sv, {**arch, "torch_pad": False})
    y_wrong = wrong.forward(x)
    assert not np.allclose(np.asarray(y_wrong), np.asarray(y_eng), atol=1e-3)


def test_mobilenet_v2_engine_torch_pad_matches_module():
    from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine

    m = get_model("mobilenet_v2", num_classes=10, width_mult=1.0,
                  torch_pad=True)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    sm, sv = _freeze_model(m, x)
    y_module = jax.jit(sm.apply)(sv, x)
    eng = MobileNetV2Int8Engine(sv, num_classes=10, torch_pad=True)
    _assert_parity(eng.forward(x), y_module)


def test_mobilenet_v1_engine_torch_pad_matches_module():
    from qtpu.serve.mobilenet_v1_engine import MobileNetV1Int8Engine

    m = get_model("mobilenet_v1", num_classes=10, width_mult=1.0,
                  torch_pad=True)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    sm, sv = _freeze_model(m, x)
    y_module = jax.jit(sm.apply)(sv, x)
    eng = MobileNetV1Int8Engine(sv, num_classes=10, torch_pad=True)
    _assert_parity(eng.forward(x), y_module)


def test_build_engine_torch_ckpt_serves_flat(tmp_path):
    """Serve CLI: a torchvision-convention .pth reaches the flat engine
    (serve_path=flat-engine) and predictions match the module SERVE path."""
    torch = pytest.importorskip("torch")
    from test_import_torch import TVBasicBlock, TVResNet, _randomize

    from qtpu.examples.configs import ExperimentConfig
    from qtpu.serve.cli import build_engine, _serve_module, _freeze_from_config

    tnet = TVResNet(TVBasicBlock, (2, 2, 2, 2), width=8, nclass=10)
    _randomize(tnet, seed=3)
    ckpt = tmp_path / "rn18.pth"
    torch.save(tnet.state_dict(), str(ckpt))

    cfg = ExperimentConfig(
        name="rn18_torch_test", model="resnet18", dataset="cifar10",
        num_classes=10, image_size=64, method="ptq", width=8,
        cifar_stem=False, batch_size=4, calib_batches=2, n_train=16,
        n_eval=8)
    engine, info = build_engine(cfg, buckets=(4,), torch_ckpt=str(ckpt),
                                max_wait_ms=1.0)
    try:
        assert info["serve_path"] == "flat-engine", info
        assert info["torch_pad"] is True
        x = np.asarray(jax.random.normal(KEY, (4, 64, 64, 3)))
        preds = engine.predict(x)
        # module-path reference over the same frozen weights
        smodel, svars = _freeze_from_config(
            cfg, KEY, (64, 64, 3), torch_ckpt=str(ckpt))
        ref = jax.jit(smodel.apply)(svars, jnp.asarray(x))
        assert (np.argmax(preds, -1) == np.argmax(np.asarray(ref), -1)).all()
    finally:
        engine.stop()


def test_build_engine_conflicting_sources_rejected(tmp_path):
    """--torch-ckpt with --load-state/--load-frozen is ambiguous: exactly
    one fp32 source must win, so the CLI refuses (ADVICE r3)."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    cfg = CONFIGS["lenet_mnist_int8"]
    with pytest.raises(SystemExit):
        build_engine(cfg, torch_ckpt="x.pth", load_state="y")
    with pytest.raises(SystemExit):
        build_engine(cfg, torch_ckpt="x.pth", load_frozen="z")


def test_build_engine_torch_ckpt_unsupported_model():
    """Unsupported models fail with the importer registry's explanation."""
    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    with pytest.raises(SystemExit, match="no torch importer"):
        build_engine(CONFIGS["lenet_mnist_int8"], torch_ckpt="x.pth")
    with pytest.raises(SystemExit, match="no torch importer"):
        build_engine(CONFIGS["mobilenetv1_imagenet_int8_ptq"],
                     torch_ckpt="x.pth")
