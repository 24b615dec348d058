from .mesh import make_mesh  # noqa: F401
from . import sharding, steps  # noqa: F401
