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

# NOTE: the persistent compilation cache is deliberately NOT enabled here.
# XLA:CPU AOT entries written under a different detected machine-feature set
# (e.g. +prefer-no-scatter from the TPU-process CPU fallback) abort the
# process on deserialization ("Fatal Python error: Aborted" inside
# compilation_cache.get_executable_and_time). The TPU entry points keep the
# cache (core/cache.py); the test suite trades repeat-run speed for
# stability.

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Fast-smoke tier (VERDICT r4 #8): one representative suite per subsystem,
# <10 min on the 1-core dev host. `pytest -m smoke` is the pre-commit gate;
# the full suite (~1.7 h) remains the round gate. Module-level marking keeps
# the list in one place instead of decorating 500+ tests.
SMOKE_MODULES = {
    "test_core",              # config/path registry/mesh
    "test_align",             # front-pad resampling ops (read_data semantics)
    "test_losses_metrics",    # CE/MSE + WAF/emoval metric stack
    "test_status_claims",     # STATUS truthfulness pins
    "test_bench_contract",    # bench compact-line contract
    "test_ov_metrics",        # emotion-wheel OV metrics
    "test_fusion_zoo",        # all 16 fusion models forward/grad
    "test_mllm",              # AffectGPT core forward/train/generate
    "test_feature_extraction",  # audio extractor pipeline
    "test_cli_main_release",  # 5-fold CV driver end-to-end
    "test_serve",             # continuous-batching engine
    "test_parallel",          # dp/tp mesh + sharded generate/extract
    "test_normalize_datasets",  # dataset converters
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.module.__name__ in SMOKE_MODULES:
            item.add_marker(pytest.mark.smoke)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Release compiled executables + tracing caches between test modules.

    With ~200 tests compiling hundreds of XLA:CPU executables in one
    process, the suite reproducibly segfaulted inside
    backend_compile_and_load around test ~183 (regardless of which tests
    ran; position-dependent, passes in isolation). Dropping caches at module
    boundaries keeps the per-process compiler state bounded. Modules don't
    share jit signatures, so this costs almost nothing.
    """
    yield
    jax.clear_caches()
