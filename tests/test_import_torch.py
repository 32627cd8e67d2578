"""Forward-parity tests for the torch-checkpoint importer.

Builds minimal torch reference nets that replicate torchvision's module
NAMING and geometry exactly (conv1/bn1/layerN.M.convK/downsample/fc;
features.N.conv.* for MobileNetV2), randomizes every parameter AND the BN
running statistics, exports ``state_dict()``, imports into the matching
qtpu model (``torch_pad=True``), and asserts the fp32 eval-mode logits
agree.  This is true numerical parity, not just shape plumbing: any layout
transpose, BN-fold, padding-geometry, or naming error shows up as a logit
mismatch.  (SURVEY.md §1.2 R1/R6 — the reference's pretrained-zoo entry
workflow; mount empty, §0.)
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from qtpu.data.import_torch import (  # noqa: E402
    import_mobilenet_v2_state,
    import_resnet_state,
    import_torch_state,
)
from qtpu.models import get_model  # noqa: E402
from qtpu.models.resnet import BasicBlock, Bottleneck, ResNet  # noqa: E402


def _randomize(net: tnn.Module, seed: int) -> None:
    """Fill every param and BN running stat with seeded random values."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for p in net.parameters():
            p.copy_(torch.randn(p.shape, generator=g) * 0.2)
        for m in net.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.running_mean.copy_(torch.randn(m.running_mean.shape,
                                                 generator=g) * 0.1)
                m.running_var.copy_(
                    torch.rand(m.running_var.shape, generator=g) + 0.5)


def _compare(tnet: tnn.Module, qmodel, importer, seed: int,
             hw: int = 64, atol: float = 1e-3) -> None:
    _randomize(tnet, seed)
    tnet.eval()
    x = torch.randn(2, 3, hw, hw, generator=torch.Generator().manual_seed(7))
    with torch.no_grad():
        ref = tnet(x).numpy()

    variables = qmodel.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, hw, hw, 3)), train=False)
    variables = importer(tnet.state_dict(), variables)
    got = np.asarray(qmodel.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False))
    np.testing.assert_allclose(got, ref, atol=atol, rtol=1e-3)


# ---------------------------------------------------------------- ResNet --

class TVBasicBlock(tnn.Module):
    expansion = 1

    def __init__(self, cin, w, stride):
        super().__init__()
        self.conv1 = tnn.Conv2d(cin, w, 3, stride, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = tnn.Conv2d(w, w, 3, 1, 1, bias=False)
        self.bn2 = tnn.BatchNorm2d(w)
        self.downsample = None
        if stride != 1 or cin != w:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, w, 1, stride, bias=False),
                tnn.BatchNorm2d(w))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        return torch.relu(y + idn)


class TVBottleneck(tnn.Module):
    expansion = 4

    def __init__(self, cin, w, stride):
        super().__init__()
        out = w * 4
        self.conv1 = tnn.Conv2d(cin, w, 1, bias=False)
        self.bn1 = tnn.BatchNorm2d(w)
        self.conv2 = tnn.Conv2d(w, w, 3, stride, 1, bias=False)  # v1.5
        self.bn2 = tnn.BatchNorm2d(w)
        self.conv3 = tnn.Conv2d(w, out, 1, bias=False)
        self.bn3 = tnn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or cin != out:
            self.downsample = tnn.Sequential(
                tnn.Conv2d(cin, out, 1, stride, bias=False),
                tnn.BatchNorm2d(out))

    def forward(self, x):
        idn = x if self.downsample is None else self.downsample(x)
        y = torch.relu(self.bn1(self.conv1(x)))
        y = torch.relu(self.bn2(self.conv2(y)))
        y = self.bn3(self.conv3(y))
        return torch.relu(y + idn)


class TVResNet(tnn.Module):
    """torchvision-naming ResNet (conv1/bn1/maxpool/layerN/fc)."""

    def __init__(self, block, stage_sizes, width, nclass):
        super().__init__()
        self.conv1 = tnn.Conv2d(3, width, 7, 2, 3, bias=False)
        self.bn1 = tnn.BatchNorm2d(width)
        self.maxpool = tnn.MaxPool2d(3, 2, 1)
        cin = width
        self.stages = []
        for i, n in enumerate(stage_sizes):
            w = width * (2 ** i)
            blocks = []
            for j in range(n):
                stride = 2 if (i > 0 and j == 0) else 1
                blocks.append(block(cin, w, stride))
                cin = w * block.expansion
            setattr(self, f"layer{i + 1}", tnn.Sequential(*blocks))
            self.stages.append(f"layer{i + 1}")
        self.fc = tnn.Linear(cin, nclass)

    def forward(self, x):
        x = self.maxpool(torch.relu(self.bn1(self.conv1(x))))
        for name in self.stages:
            x = getattr(self, name)(x)
        return self.fc(x.mean(dim=(2, 3)))


def test_resnet_basicblock_parity():
    tnet = TVResNet(TVBasicBlock, (1, 2), width=8, nclass=5)
    qm = ResNet(block=BasicBlock, stage_sizes=(1, 2), width=8, num_classes=5,
                cifar_stem=False, torch_pad=True)
    _compare(tnet, qm, import_resnet_state, seed=0)


def test_resnet_bottleneck_parity():
    tnet = TVResNet(TVBottleneck, (1, 2), width=8, nclass=7)
    qm = ResNet(block=Bottleneck, stage_sizes=(1, 2), width=8, num_classes=7,
                cifar_stem=False, torch_pad=True)
    _compare(tnet, qm, import_resnet_state, seed=1)


def test_resnet50_registry_shapes():
    """Full ResNet-50: every tensor of a torchvision-shaped checkpoint maps
    (structure check at real scale; parity is covered by the minis)."""
    tnet = TVResNet(TVBottleneck, (3, 4, 6, 3), width=64, nclass=1000)
    qm = get_model("resnet50", num_classes=1000, torch_pad=True)
    variables = jax.eval_shape(
        lambda: qm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3)), train=False))
    out = import_torch_state("resnet50", tnet.state_dict(), variables)
    assert out["params"]["stem"]["kernel"].shape == (7, 7, 3, 64)
    assert out["params"]["layer4_2"]["conv3"]["kernel"].shape == \
        (1, 1, 512, 2048)


def test_resnet34_101_registry_shapes():
    """Round-5 zoo additions: the structure-derived importer maps the
    deeper torchvision stage layouts with zero code changes."""
    for name, block, stages, last in (
            ("resnet34", TVBasicBlock, (3, 4, 6, 3),
             ("layer4_2", "conv2", (3, 3, 512, 512))),
            ("resnet101", TVBottleneck, (3, 4, 23, 3),
             ("layer3_22", "conv3", (1, 1, 256, 1024)))):
        tnet = TVResNet(block, stages, width=64, nclass=1000)
        qm = get_model(name, num_classes=1000, torch_pad=True)
        variables = jax.eval_shape(
            lambda qm=qm: qm.init(jax.random.PRNGKey(0),
                                  jnp.zeros((1, 64, 64, 3)), train=False))
        out = import_torch_state(name, tnet.state_dict(), variables)
        blk, conv, shape = last
        assert out["params"][blk][conv]["kernel"].shape == shape, name


# ----------------------------------------------------------- MobileNetV2 --

class TVConvBNReLU(tnn.Sequential):
    def __init__(self, cin, cout, k, stride, groups=1):
        super().__init__(
            tnn.Conv2d(cin, cout, k, stride, (k - 1) // 2, groups=groups,
                       bias=False),
            tnn.BatchNorm2d(cout),
            tnn.ReLU6(inplace=True))


class TVInvertedResidual(tnn.Module):
    def __init__(self, cin, cout, stride, expand):
        super().__init__()
        hidden = cin * expand
        layers = []
        if expand != 1:
            layers.append(TVConvBNReLU(cin, hidden, 1, 1))
        layers += [TVConvBNReLU(hidden, hidden, 3, stride, groups=hidden),
                   tnn.Conv2d(hidden, cout, 1, bias=False),
                   tnn.BatchNorm2d(cout)]
        self.conv = tnn.Sequential(*layers)
        self.use_res = stride == 1 and cin == cout

    def forward(self, x):
        y = self.conv(x)
        return x + y if self.use_res else y


class TVMobileNetV2(tnn.Module):
    """torchvision-naming MobileNetV2 (features.N / classifier.1)."""

    def __init__(self, nclass):
        super().__init__()
        cfg = [(1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
               (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1)]
        feats = [TVConvBNReLU(3, 32, 3, 2)]
        cin = 32
        for t, c, n, s in cfg:
            for j in range(n):
                feats.append(TVInvertedResidual(cin, c, s if j == 0 else 1, t))
                cin = c
        feats.append(TVConvBNReLU(cin, 1280, 1, 1))
        self.features = tnn.Sequential(*feats)
        self.classifier = tnn.Sequential(tnn.Dropout(0.2),
                                         tnn.Linear(1280, nclass))

    def forward(self, x):
        return self.classifier(self.features(x).mean(dim=(2, 3)))


def test_mobilenet_v2_parity():
    tnet = TVMobileNetV2(nclass=11)
    qm = get_model("mobilenet_v2", num_classes=11, torch_pad=True)
    _compare(tnet, qm, import_mobilenet_v2_state, seed=2, hw=96)


# ------------------------------------------------------------ strictness --

def test_leftover_keys_raise():
    tnet = TVResNet(TVBasicBlock, (1,), width=8, nclass=3)
    qm = ResNet(block=BasicBlock, stage_sizes=(1,), width=8, num_classes=3,
                cifar_stem=False, torch_pad=True)
    variables = jax.eval_shape(
        lambda: qm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)), train=False))
    sd = dict(tnet.state_dict())
    sd["layer9.0.conv1.weight"] = torch.zeros(8, 8, 3, 3)
    with pytest.raises(ValueError, match="not consumed"):
        import_resnet_state(sd, variables)


def test_shape_mismatch_raises():
    tnet = TVResNet(TVBasicBlock, (1,), width=16, nclass=3)  # wrong width
    qm = ResNet(block=BasicBlock, stage_sizes=(1,), width=8, num_classes=3,
                cifar_stem=False, torch_pad=True)
    variables = jax.eval_shape(
        lambda: qm.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)), train=False))
    with pytest.raises(ValueError, match="shape mismatch"):
        import_resnet_state(tnet.state_dict(), variables)


def test_run_cli_torch_ckpt(tmp_path, capsys):
    """`qtpu.examples.run --torch-ckpt model.pth` — the reference's
    pretrained-zoo workflow end-to-end through the real CLI: a saved
    torchvision-convention .pth becomes the fp32 baseline (no fp32
    training), then PTQ convert/calibrate/eval runs on top of it."""
    from qtpu.examples.run import main

    tnet = TVResNet(TVBasicBlock, (2, 2, 2, 2), width=8, nclass=10)
    _randomize(tnet, seed=4)
    path = str(tmp_path / "resnet18.pth")
    torch.save(tnet.state_dict(), path)
    rc = main(["--config", "resnet18_cifar10_int8_kl",
               "--torch-ckpt", path, "--quiet",
               "--set", "cifar_stem=False", "--set", "width=8",
               "--set", "act_observer=minmax",
               "--set", "n_train=128", "--set", "n_eval=128",
               "--set", "calib_batches=1", "--set", "batch_size=32"])
    assert rc == 0
    import json as _json
    result = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    # random weights on synthetic data: the contract is that the pipeline
    # ran and int8 tracks the IMPORTED baseline, not absolute accuracy
    assert 0.0 <= result["quant_top1"] <= 1.0
    assert abs(result["quant_top1"] - result["fp32_top1"]) <= 0.25


def test_serve_torch_ckpt_module_path(tmp_path):
    """Serving stack built straight from a pretrained torch .pth
    (`python -m qtpu.serve --torch-ckpt ...`): serves on the FLAT int8
    engine (round-4 torch_pad geometry support), int8 predictions track
    the imported fp32 torch net."""
    import dataclasses

    from qtpu.examples.configs import CONFIGS
    from qtpu.serve.cli import build_engine

    tnet = TVResNet(TVBasicBlock, (2, 2, 2, 2), width=8, nclass=10)
    _randomize(tnet, seed=5)
    tnet.eval()
    path = str(tmp_path / "r18.pth")
    torch.save(tnet.state_dict(), path)
    cfg = dataclasses.replace(
        CONFIGS["resnet18_cifar10_int8_kl"], cifar_stem=False, width=8,
        act_observer="minmax", n_train=64, calib_batches=1, batch_size=16)
    engine, info = build_engine(cfg, buckets=(4,), max_wait_ms=50.0,
                                torch_ckpt=path)
    assert info["serve_path"] == "flat-engine"
    x = np.random.default_rng(2).random((4, 32, 32, 3)).astype(np.float32)
    try:
        logits = engine.predict(x)
    finally:
        engine.stop()
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    assert logits.shape == (4, 10)
    agree = float(np.mean(logits.argmax(-1) == ref.argmax(-1)))
    assert agree >= 0.75, agree


def test_ptq_after_import():
    """Reference workflow e2e: pretrained torch weights -> convert ->
    calibrate -> int8 eval tracks the imported fp32 model."""
    from qtpu.nn import QuantPolicy
    from qtpu.transform import calibrate, convert_model

    tnet = TVResNet(TVBasicBlock, (1, 1), width=8, nclass=5)
    _randomize(tnet, seed=3)
    tnet.eval()
    qmodel = ResNet(block=BasicBlock, stage_sizes=(1, 1), width=8,
                    num_classes=5, cifar_stem=False, torch_pad=True)
    converted = convert_model(qmodel, QuantPolicy.int8_ptq())
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (16, 64, 64, 3))
    variables = converted.init(key, x, train=False)
    variables = import_resnet_state(tnet.state_dict(), variables)
    variables = calibrate(converted, dict(variables), [x])
    logits_q = converted.apply(variables, x, train=False)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(
            np.array(x).transpose(0, 3, 1, 2))).numpy()
    agree = float(np.mean(np.argmax(np.asarray(logits_q), -1)
                          == np.argmax(ref, -1)))
    assert agree >= 0.75, agree
