"""Test configuration: force the CPU backend with 8 simulated devices so
sharded (``shard_map``) code paths run without TPU hardware — the same
technique the reference uses (``tests/test_multidevice/conftest.py:38-63``).

Must run before jax is imported anywhere, hence the env mutation at module
import time.
"""
import datetime
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    """Date-seeded PRNG key: deterministic within a day, rotating daily
    (mirrors the reference fixture strategy, ``tests/fixtures.py:44-57``)."""
    seed = int(datetime.date.today().strftime("%Y%m%d"))
    return jax.random.key(seed)
