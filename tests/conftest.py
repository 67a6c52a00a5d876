"""Test harness: force an 8-virtual-device CPU platform.

Multi-chip sharding tests run on a virtual CPU mesh
(`--xla_force_host_platform_device_count=8`) since real multi-chip TPU
hardware is not available in CI (SURVEY.md §4).

Note: this container's boot hook pre-imports JAX with the remote-TPU
("axon") platform in every interpreter, so env vars alone are too late —
we must update jax.config before any backend is initialized.
"""

import os

import pytest

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache: the suite is compile-bound on small hosts;
# warm CI runs skip almost all of it (also used by the CLI, config.py).
_CACHE = os.environ.get("RT0_JAX_CACHE",
                        os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE))
# 0.1 (not the 1.0 default elsewhere): the suite is made of hundreds of
# 0.2-0.9 s compiles that dominate its 45-55 min wall time on this
# 2-core host — caching them is the whole point here, and the cache-dir
# size cost is a few MB.
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)


@pytest.fixture(autouse=True, scope="module")
def _bound_live_executables():
    """Clear JAX's in-process jit caches after every test module.

    The full default tier accumulates ~150 live XLA:CPU executables in
    one process, and at that count the backend segfaults inside a later
    pjit compile — reproduced twice at the exact same test
    (test_surface_layer::test_tiled_restir_matches_monolithic), which
    passes in isolation and in small subsets.  Bounding the live set
    per module avoids the upstream longevity bug; the persistent
    compile cache (0.1 s threshold above) turns the re-tracing this
    causes into disk hits, so the suite stays within budget."""
    yield
    jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    """Tests marked `slow` only run with RT0_RUN_SLOW=1 (CI keeps the
    default suite under budget; the slow tier is the exhaustive one)."""
    if os.environ.get("RT0_RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow: set RT0_RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
