"""MeshConfig: declared mesh construction + chain placement."""
import jax
import jax.numpy as jnp
import pytest

from blackjax_tpu.parallel import MeshConfig, chains_spec

NUM_DEVICES = 8


@pytest.fixture
def devices():
    ds = jax.devices()
    if len(ds) < NUM_DEVICES:
        pytest.skip("needs 8 virtual devices")
    return ds[:NUM_DEVICES]


def test_default_chains_mesh(devices):
    cfg = MeshConfig()
    mesh = cfg.build(devices)
    assert mesh.axis_names == ("chains",)
    assert mesh.devices.size == NUM_DEVICES

    x = jnp.zeros((32, 4))
    sharded = cfg.shard_chains(mesh, x)
    assert sharded.sharding.spec == chains_spec()


def test_two_axis_mesh_and_validation(devices):
    cfg = MeshConfig(axis_names=("dcn", "chains"), axis_sizes=(2, 4))
    mesh = cfg.build(devices)
    assert mesh.axis_names == ("dcn", "chains")
    assert mesh.devices.shape == (2, 4)

    with pytest.raises(ValueError, match="does not match"):
        MeshConfig(axis_names=("chains",), axis_sizes=(2, 4)).build(devices)
    with pytest.raises(ValueError, match="devices"):
        MeshConfig(axis_sizes=(999,)).build(devices)


def test_accum_dtype_follows_x64():
    cfg = MeshConfig()
    expected = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    assert cfg.effective_accum_dtype() == expected
    assert MeshConfig(accum_dtype=jnp.float32).effective_accum_dtype() == jnp.float32
