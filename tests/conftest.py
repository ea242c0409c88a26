"""Test env: force an 8-device virtual CPU mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 multi-host testing note)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# NO persistent compile cache for CPU test runs: XLA:CPU AOT executables
# do not reliably survive the serialize/deserialize round trip on this
# fleet — the loader flags its own artifacts as machine-mismatched
# (tuning flags like +prefer-no-scatter are recorded as target features)
# and large gather-heavy programs segfault in get_executable_and_time on
# read-back, even within a single process. Recompiling across test
# modules is slower but deterministic. (The TPU bench path keeps its own
# cache — axon executables don't go through the CPU AOT loader.)
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# The env vars above are NOT sufficient on hosts whose sitecustomize
# registers a TPU plugin at interpreter boot and force-selects it via
# jax.config.update("jax_platforms", ...) — an explicit config.update
# beats JAX_PLATFORMS, so the whole suite would silently run single-chip
# on the TPU and every mesh test would skip. Re-assert the CPU platform
# through the same config API (and drop any already-initialized backends
# so the 8-device host count takes effect).
from purejaxql_tpu.utils.platform import honor_jax_platforms_env  # noqa: E402

honor_jax_platforms_env()
import jax  # noqa: E402

assert len(jax.devices()) == 8 and jax.devices()[0].platform == "cpu", (
    f"test mesh setup failed: {jax.devices()}"
)

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Full-suite single-process runs accumulate hundreds of live compiled
    executables across the 8-device mesh; past ~130 tests the process
    dies with SIGSEGV/SIGABRT in native code (thread/mapping exhaustion,
    not Python-level OOM). Dropping the in-memory executable cache
    between modules keeps the footprint flat — recompiles hit the on-disk
    persistent cache."""
    yield
    import jax

    jax.clear_caches()
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.5")


# ---------------------------------------------------------------------------
# Quick tier: `pytest -m quick` runs a <5-minute engine smoke — config
# policy, stage math (returns), all three golden-numerics families, envs,
# wrappers, CLI end-to-end — so "the full suite takes ~an hour" is never a
# reason not to test before a commit. Membership is whole fast modules
# (measured: the set below sums to ~3 minutes single-process) minus any
# test individually marked slow.
# ---------------------------------------------------------------------------

QUICK_MODULES = {
    "test_fast_defaults", "test_returns", "test_utils", "test_gif",
    "test_cli", "test_envs", "test_golden", "test_minatar_golden",
    "test_forager_golden", "test_batch_renorm", "test_wrappers_extra",
    "test_sweep", "test_rollout_tool",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = getattr(item, "module", None)
        name = mod.__name__.rsplit(".", 1)[-1] if mod else ""
        if name in QUICK_MODULES and "slow" not in item.keywords:
            item.add_marker(pytest.mark.quick)
