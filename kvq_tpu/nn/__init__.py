from . import layers, resnet, heads  # noqa: F401
from . import clip_model  # noqa: F401
