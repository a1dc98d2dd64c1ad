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
# <10 min on the 1-core dev host (measured solo: the set below sums to
# ~515 s incl. interpreter/jax startup per module). `pytest -m smoke` is
# the pre-commit gate; the full suite (~1.7 h) remains the round gate.
# Module-level marking keeps the list in one place instead of decorating
# 500+ tests. Deliberately excluded for budget, with their coverage
# carried elsewhere: test_fusion_zoo (260 s; the CV driver suite below
# trains a fusion model end-to-end) and test_parallel (75 s; the driver's
# dryrun_multichip exercises every mesh path each round).
SMOKE_MODULES = {
    "test_core",              # config/path registry/mesh          (~10 s)
    "test_align",             # front-pad resampling ops           (~15 s)
    "test_losses_metrics",    # CE/MSE + WAF/emoval metric stack   (~10 s)
    "test_status_claims",     # STATUS truthfulness pins            (~5 s)
    "test_bench_contract",    # bench compact-line contract         (~8 s)
    "test_ov_metrics",        # emotion-wheel OV metrics           (~10 s)
    "test_mllm",              # AffectGPT forward/train/generate  (~131 s)
    "test_feature_extraction",  # audio extractor pipeline         (~80 s)
    "test_cli_main_release",  # 5-fold CV driver end-to-end       (~123 s)
    "test_serve",             # continuous-batching engine        (~114 s)
    "test_normalize_datasets",  # dataset converters                (~7 s)
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
