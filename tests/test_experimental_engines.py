"""serve.experimental subclasses vs the product engines.

The round-4 extraction (VERDICT r3 #8) moved the opt-in Pallas kernel
families out of the product constructors; the experimental subclasses with
all flags OFF must remain bit-identical to the product engines (they share
the same forward — the dispatch tables are simply never populated), and
the base engines' tables must stay empty.
"""
import jax
import numpy as np

from qtpu.models import get_model
from qtpu.nn import QuantPolicy
from qtpu.serve.experimental import (ExperimentalMobileNetV2Int8Engine,
                                     ExperimentalResNetInt8Engine)
from qtpu.serve.mobilenet_engine import MobileNetV2Int8Engine
from qtpu.serve.resnet_engine import ResNetInt8Engine
from qtpu.transform import calibrate, convert_model, freeze

KEY = jax.random.PRNGKey(0)


def _freeze(model, x):
    qm = convert_model(model, QuantPolicy.int8_ptq())
    v = dict(jax.jit(qm.init, static_argnames="train")(KEY, x, train=True))
    v = calibrate(qm, v, [x])
    return freeze(qm, v, x)[1]


def test_resnet_experimental_off_is_product():
    m = get_model("resnet18", num_classes=10, cifar_stem=True)
    x = jax.random.normal(KEY, (4, 32, 32, 3))
    sv = _freeze(m, x)
    arch = dict(stage_sizes=(2, 2, 2, 2), width=64, bottleneck=False,
                cifar_stem=True, num_classes=10)
    prod = ResNetInt8Engine(sv, arch)
    exp = ExperimentalResNetInt8Engine(sv, arch)
    for tbl in ("_qblock_prep", "_qtail_prep", "_qproj_prep", "_qstage_prep"):
        assert getattr(prod, tbl) == {}, tbl
        assert getattr(exp, tbl) == {}, tbl
    assert np.array_equal(np.asarray(prod.forward(x)),
                          np.asarray(exp.forward(x)))


def test_mobilenet_experimental_off_is_product():
    m = get_model("mobilenet_v2", num_classes=10)
    x = jax.random.normal(KEY, (2, 64, 64, 3))
    sv = _freeze(m, x)
    prod = MobileNetV2Int8Engine(sv, num_classes=10)
    exp = ExperimentalMobileNetV2Int8Engine(sv, num_classes=10)
    assert prod._qivr_prep == {} and exp._qivr_prep == {}
    assert np.array_equal(np.asarray(prod.forward(x)),
                          np.asarray(exp.forward(x)))
