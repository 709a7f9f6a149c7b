"""Test configuration: force the CPU backend with 8 simulated devices so
sharded (``shard_map``) code paths run without TPU hardware — the same
technique the reference uses (``tests/test_multidevice/conftest.py:38-63``).

The environment's sitecustomize imports jax at interpreter startup and
pins the ``axon`` TPU platform, so env-var mutation here is too late;
``jax.config.update`` before first backend use still works, as does setting
``XLA_FLAGS`` before the CPU client is created.
"""
import datetime
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

try:
    jax.config.update("jax_platforms", "cpu")
except Exception:  # pragma: no cover — backend already initialized
    pass

# Default test pass runs in x64 (reference parity: f64-CPU-friendly).
# ``BJT_TEST_X64=0 pytest tests/ -m "not x64only"`` is the f32 pass — the
# package must work in TPU-native f32 too; tests that genuinely need f64
# (tight bit-level tolerances, the f32-fragile low-rank/meta estimators)
# carry the ``x64only`` marker.
X64 = os.environ.get("BJT_TEST_X64", "1") == "1"
jax.config.update("jax_enable_x64", X64)

import pytest  # noqa: E402


_TESTS_SINCE_CACHE_CLEAR = [0]


def pytest_runtest_teardown(item, nextitem):
    # A single pytest process accumulates hundreds of XLA CPU executables;
    # past ~500 compiles the backend has been observed to segfault inside
    # backend_compile (late-suite, state-dependent). Dropping the caches
    # every 100 tests bounds that state; individual tests never rely on
    # cross-test compilation caching.
    _TESTS_SINCE_CACHE_CLEAR[0] += 1
    if _TESTS_SINCE_CACHE_CLEAR[0] >= 100:
        _TESTS_SINCE_CACHE_CLEAR[0] = 0
        jax.clear_caches()


def pytest_collection_modifyitems(config, items):
    # durations-driven tiering: tests listed in tests/slow_tests.txt get the
    # ``slow`` marker (regenerate the list from ``pytest --durations``), so
    # the default CI pass is ``-m "not slow"`` and stays fast
    slow_list_path = os.path.join(os.path.dirname(__file__), "slow_tests.txt")
    slow_ids = set()
    if os.path.exists(slow_list_path):
        with open(slow_list_path) as fh:
            slow_ids = {line.strip() for line in fh if line.strip()}
    slow_marker = pytest.mark.slow
    skip = pytest.mark.skip(reason="requires x64 (run without BJT_TEST_X64=0)")
    for item in items:
        if item.nodeid in slow_ids:
            item.add_marker(slow_marker)
        if not X64 and "x64only" in item.keywords:
            item.add_marker(skip)


@pytest.fixture
def rng_key():
    """Date-seeded PRNG key: deterministic within a day, rotating daily
    (mirrors the reference fixture strategy, ``tests/fixtures.py:44-57``).

    ``BJT_TEST_SEED=<int>`` overrides the date — used by
    ``tools/seed_sweep.py`` to measure per-test seed-sweep failure rates
    (any statistical test's daily red risk should be <1%)."""
    seed_env = os.environ.get("BJT_TEST_SEED")
    if seed_env is not None:
        return jax.random.key(int(seed_env))
    seed = int(datetime.date.today().strftime("%Y%m%d"))
    return jax.random.key(seed)
