"""Persistent XLA compilation cache.

On the target platform a fresh compile of even a small encoder takes minutes
and is not shared across processes. Enabling JAX's persistent compilation
cache makes every CLI invocation after the first reuse compiled executables
from disk, which matters for the reference's workflow of many short-lived
script invocations (one `extract_*.py` / `main-release.py` run per feature /
hyperparameter sample — e.g. ``MERBench/run.sh:1-150`` launches dozens of
processes).

Call :func:`enable_persistent_cache` before the first jitted computation.
All CLIs and ``bench.py`` do this automatically.
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.environ.get(
    "MERTPU_COMPILATION_CACHE", os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))

_enabled = False


def enable_persistent_cache(cache_dir: str | None = None) -> str:
    """Point JAX at an on-disk compilation cache (idempotent).

    No-op on the CPU backend: XLA:CPU AOT entries written under a different
    detected machine-feature set (e.g. by a TPU process's CPU fallback)
    SEGFAULT/abort on deserialization. Set MERTPU_CPU_CACHE=1 to force.
    """
    global _enabled
    import jax

    path = cache_dir or _DEFAULT_DIR
    if _enabled:
        return path
    if (jax.default_backend() == "cpu"
            and not os.environ.get("MERTPU_CPU_CACHE")):
        return path
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything, including sub-second compiles: process startup cost
    # dominates on this platform, so even small entries pay off.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    _enabled = True
    return path
