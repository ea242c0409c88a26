"""Test env: force an 8-device virtual CPU mesh so sharding logic is
exercised without TPU hardware (SURVEY.md §4 multi-host testing note)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# key the persistent compile cache by CPU fingerprint: XLA:CPU AOT
# artifacts baked for one machine's vector extensions SIGILL when a
# fleet scheduler moves the workspace to a host with different features
def _cpu_tag():
    import hashlib

    try:
        with open("/proc/cpuinfo") as f:
            info = f.read()
        lines = [
            ln for ln in info.splitlines()
            if ln.startswith(("model name", "flags"))
        ]
        return hashlib.md5("\n".join(sorted(set(lines))).encode()).hexdigest()[:10]
    except OSError:
        return "default"


os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", f"/tmp/jax_test_cache_{_cpu_tag()}"
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
