from .registry import registry  # noqa: F401
from . import config, globals_mer, mesh  # noqa: F401
