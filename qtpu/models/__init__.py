"""Model zoo (Flax, NHWC) — the offline rebuild of the reference's gluoncv usage."""
from qtpu.models.lenet import LeNet5
from qtpu.models.mobilenet import MobileNetV1, MobileNetV2
from qtpu.models.resnet import (ResNet, ResNet18, ResNet20, ResNet34,
                                ResNet50, ResNet56, ResNet101)

_REGISTRY = {
    "lenet5": LeNet5,
    "resnet18": ResNet18,
    "resnet20": ResNet20,
    "resnet34": ResNet34,
    "resnet50": ResNet50,
    "resnet56": ResNet56,
    "resnet101": ResNet101,
    "mobilenet_v1": MobileNetV1,
    "mobilenet_v2": MobileNetV2,
    # gluoncv spellings of the CIFAR variants, for reference-API familiarity
    # (the reference's CIFAR examples call gluoncv get_model with these).
    "cifar_resnet20_v1": ResNet20,
    "cifar_resnet56_v1": ResNet56,
}


def get_model(name: str, **kwargs):
    """gluoncv-style ``get_model`` entry point (SURVEY.md §1.2 R6)."""
    try:
        return _REGISTRY[name.lower()](**kwargs)
    except KeyError:
        raise ValueError(
            f"unknown model {name!r}; available: {sorted(_REGISTRY)}") from None


__all__ = ["LeNet5", "MobileNetV1", "MobileNetV2", "ResNet", "ResNet18",
           "ResNet20", "ResNet34", "ResNet50", "ResNet56", "ResNet101",
           "get_model"]
