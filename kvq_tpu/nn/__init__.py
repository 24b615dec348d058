from . import layers, resnet, heads  # noqa: F401
