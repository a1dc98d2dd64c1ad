from .decode import greedy_decode  # noqa: F401
from .pipeline import WhisperASR  # noqa: F401
