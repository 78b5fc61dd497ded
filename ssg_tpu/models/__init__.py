"""Model factory, mirroring the reference's ``models.create`` surface
([reid/models/__init__.py], SURVEY.md §2 #3)."""

from ssg_tpu.models.inception import SSGInception, inception
from ssg_tpu.models.resnet import SSGResNet, resnet18, resnet34, resnet50, resnet101, resnet152

_FACTORY = {
    "resnet18": resnet18,
    "resnet34": resnet34,
    "resnet50": resnet50,
    "resnet101": resnet101,
    "resnet152": resnet152,
    "inception": inception,
}


def names() -> list[str]:
    return sorted(_FACTORY)


def create(name: str, *args, **kwargs):
    """Create a model. ``create('resnet50', num_features=1024, dropout=0.5,
    num_classes=..)`` — the reference's factory call shape."""
    if name not in _FACTORY:
        raise KeyError(f"Unknown model: {name!r}; known: {names()}")
    return _FACTORY[name](*args, **kwargs)
