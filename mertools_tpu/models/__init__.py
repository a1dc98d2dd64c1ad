from .base import get_model  # noqa: F401
from . import attention  # noqa: F401  (registers "attention")
