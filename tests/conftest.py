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
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402


@pytest.fixture
def rng_key():
    """Date-seeded PRNG key: deterministic within a day, rotating daily
    (mirrors the reference fixture strategy, ``tests/fixtures.py:44-57``)."""
    seed = int(datetime.date.today().strftime("%Y%m%d"))
    return jax.random.key(seed)
