from . import config, metrics, registry  # noqa: F401
