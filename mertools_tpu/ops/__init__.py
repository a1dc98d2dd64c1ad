from . import align, losses, metrics  # noqa: F401
