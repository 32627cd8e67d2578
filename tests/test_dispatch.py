"""Shared flat-engine dispatch policy (qtpu.serve.dispatch).

One copy of the eligibility/exclude/ingest routing used by BOTH entry
points (serve CLI and examples runner) — the round-4 advisor's drift-risk
finding.  Eligibility must agree with what ``convert_model`` actually
excludes (fnmatch over real layer paths), not with literal string matching.
"""
import numpy as np
import pytest

from qtpu.serve.dispatch import (excluded_paths, flat_engine_eligible,
                                 make_flat_forward, quantized_layer_paths)


def test_layer_paths_cover_known_models():
    r50 = quantized_layer_paths("resnet50")
    assert "stem" in r50 and "fc" in r50
    assert "layer1_0/conv3" in r50 and "layer4_0/down" in r50
    assert "layer1_1/down" not in r50          # down only at stage starts
    assert "layer1_0/down" in r50              # bottleneck expands channels
    r18 = quantized_layer_paths("resnet18")
    assert "layer1_0/conv2" in r18 and "layer1_0/conv3" not in r18
    # BasicBlock nets have NO downsample in layer1_0 (stride 1, stem width
    # == stage width) — a phantom path here would let dispatch disagree
    # with convert_model (e.g. exclude=('layer1_0/down',) excludes nothing
    # in the model, so the flat engine must stay eligible)
    assert "layer1_0/down" not in r18 and "layer2_0/down" in r18
    ok, exc = flat_engine_eligible("resnet18", ("layer1_0/down",))
    assert ok and exc == frozenset()
    v2 = quantized_layer_paths("mobilenet_v2")
    assert "head" in v2 and "block0/expand" not in v2  # t=1 block: no expand
    assert "block16/project" in v2
    v1 = quantized_layer_paths("mobilenet_v1")
    assert "block12/pw" in v1 and "head" not in v1
    assert quantized_layer_paths("lenet5") == ()


@pytest.mark.parametrize("model", ["resnet50", "resnet18",
                                   "mobilenet_v1", "mobilenet_v2"])
def test_stem_fc_excludes_are_engine_ok(model):
    ok, exc = flat_engine_eligible(model, ("stem*", "fc"))
    assert ok and exc == {"stem", "fc"}
    ok, exc = flat_engine_eligible(model, ())
    assert ok and exc == frozenset()


def test_mid_block_excludes_route_to_module_path():
    ok, exc = flat_engine_eligible("resnet50", ("layer1*",))
    assert not ok and "layer1_0/conv1" in exc
    ok, _ = flat_engine_eligible("mobilenet_v2", ("block3/dw",))
    assert not ok
    ok, _ = flat_engine_eligible("lenet5", ())
    assert not ok                               # no flat engine family


def test_glob_semantics_match_convert_model():
    """The advisor's example: 'stem?' matches NOTHING under fnmatch ('?' is
    exactly one char), so convert_model excludes nothing and the flat
    engine stays eligible — dispatch must agree, not string-compare."""
    assert excluded_paths("resnet50", ("stem?",)) == frozenset()
    ok, exc = flat_engine_eligible("resnet50", ("stem?",))
    assert ok and exc == frozenset()
    # '*' matching the stem AND blocks → ineligible
    ok, _ = flat_engine_eligible("resnet50", ("*",))
    assert not ok


def test_make_flat_forward_routing():
    # module path: unknown model
    ff, pp, dt, path = make_flat_forward("lenet5")
    assert ff is None and path == "module" and dt == np.float32
    # uint8 ingest on the module path is a config error
    with pytest.raises(SystemExit):
        make_flat_forward("lenet5", uint8_ingest=True)
    # quantized stem + uint8 → host-quantized int8 codes
    ff, pp, dt, path = make_flat_forward("resnet50", uint8_ingest=True)
    assert ff is not None and pp is not None and dt == np.uint8
    assert path == "flat-engine+int8-ingest"
    # EXCLUDED fp32 stem + uint8 → raw u8 wire, on-device normalize
    # (VERDICT r4 #2: the recommended fp32-stem config composes with the
    # 4x-transfer ingest win)
    ff, pp, dt, path = make_flat_forward("resnet50", exclude=("stem*",),
                                         uint8_ingest=True)
    assert ff is not None and pp is None and dt == np.uint8
    assert path == "flat-engine+u8-ingest"
    # f32 default
    ff, pp, dt, path = make_flat_forward("mobilenet_v2", exclude=("stem",))
    assert ff is not None and pp is None and dt == np.float32
    assert path == "flat-engine"


def test_cifar_resnet20_56_dispatch():
    """gluoncv CIFAR variants (width 16) route through the shared dispatch
    with the factory-default width, not the 64 of the ImageNet family."""
    from qtpu.serve.dispatch import resnet_arch

    r20 = quantized_layer_paths("resnet20")
    assert "layer3_2/conv2" in r20 and "layer1_0/conv3" not in r20
    assert "layer1_0/down" not in r20          # width-16 stem == stage width
    r56 = quantized_layer_paths("resnet56")
    assert "layer3_8/conv2" in r56
    for model in ("resnet20", "resnet56"):
        ok, exc = flat_engine_eligible(model, ("stem*", "fc"))
        assert ok and exc == {"stem", "fc"}
        arch = resnet_arch(model, num_classes=10, image_size=32)
        assert arch["width"] == 16 and arch["cifar_stem"]
        assert not arch["bottleneck"]
    assert resnet_arch("resnet20", num_classes=10, image_size=32,
                       width=32)["width"] == 32     # explicit override wins


def test_resnet34_101_layer_paths_and_eligibility():
    """Round-5 zoo additions route through the shared dispatch."""
    r34 = quantized_layer_paths("resnet34")
    assert "layer3_5/conv2" in r34 and "layer1_0/conv3" not in r34
    r101 = quantized_layer_paths("resnet101")
    assert "layer3_22/conv3" in r101
    for model in ("resnet34", "resnet101"):
        ok, exc = flat_engine_eligible(model, ("stem*", "fc"))
        assert ok and exc == {"stem", "fc"}
        ok, _ = flat_engine_eligible(model, ("layer2*",))
        assert not ok
