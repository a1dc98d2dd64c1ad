"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
imports, so sharding/mesh tests run without TPU hardware (SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The environment's TPU plugin prepends itself to jax_platforms regardless of
# the env var; force-pin CPU so tests are hermetic and the 8-device virtual
# mesh is available.
jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: repeat suite runs skip recompiles. Separate
# directory from the TPU-process cache (different machine-feature targets).
from mertools_tpu.core.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache(os.path.join(os.path.dirname(__file__), "..",
                                     ".jax_cache_cpu"))

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
