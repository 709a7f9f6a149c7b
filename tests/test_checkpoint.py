"""Checkpoint/resume subsystem: snapshots round-trip through orbax and a
killed-and-resumed run is bit-identical to an uninterrupted one
(SURVEY.md §5.4: state + PRNG key fully determine the trajectory)."""
import jax
import jax.numpy as jnp
import numpy as np

import blackjax_tpu
from blackjax_tpu.checkpoint import load_state, run_with_checkpoints, save_state


def _logdensity(x):
    return -0.5 * jnp.sum(x**2)


def test_save_load_roundtrip(tmp_path):
    algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
    state = algo.init(jnp.arange(3.0))
    path = str(tmp_path / "snap")
    save_state(path, state)
    restored = load_state(path, state)
    for a, b in zip(jax.tree.leaves(state), jax.tree.leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_is_bit_exact(tmp_path, rng_key):
    algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
    init_state = algo.init(jnp.ones(3))

    # uninterrupted run
    full = run_with_checkpoints(
        rng_key,
        algo.step,
        init_state,
        num_steps=40,
        checkpoint_dir=str(tmp_path / "a"),
        checkpoint_every=10,
    )

    # interrupted run: stop after 20 steps...
    partial_dir = str(tmp_path / "b")
    run_with_checkpoints(
        rng_key,
        algo.step,
        init_state,
        num_steps=20,
        checkpoint_dir=partial_dir,
        checkpoint_every=10,
    )
    # ...then resume to 40 from the snapshot (initial_state ignored on resume)
    resumed = run_with_checkpoints(
        rng_key,
        algo.step,
        algo.init(123.0 * jnp.ones(3)),  # decoy: must be ignored
        num_steps=40,
        checkpoint_dir=partial_dir,
        checkpoint_every=10,
    )
    np.testing.assert_array_equal(
        np.asarray(full.position), np.asarray(resumed.position)
    )


def test_sharded_state_roundtrip(tmp_path):
    """A mesh-sharded pytree (the multi-chip resume case) must round-trip
    through save/load with values intact when restored onto the same mesh."""
    import numpy as np
    import pytest
    from jax.sharding import Mesh, NamedSharding, PartitionSpec

    from blackjax_tpu.checkpoint import load_state, save_state

    devices = np.array(jax.devices()[:8])
    if len(devices) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = Mesh(devices, ("particles",))
    sharding = NamedSharding(mesh, PartitionSpec("particles"))
    state = {
        "particles": jax.device_put(
            jnp.arange(64.0).reshape(64, 1) * 1.5, sharding
        ),
        "weights": jax.device_put(jnp.full(64, 1 / 64), sharding),
        "lam": jnp.asarray(0.37),
    }
    path = str(tmp_path / "sharded_ckpt")
    save_state(path, state)

    template = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=x.sharding),
        state,
    )
    restored = load_state(path, template=template)
    np.testing.assert_array_equal(
        np.asarray(restored["particles"]), np.asarray(state["particles"])
    )
    np.testing.assert_array_equal(
        np.asarray(restored["weights"]), np.asarray(state["weights"])
    )
    assert float(restored["lam"]) == pytest.approx(0.37)
    # the restore honored the requested sharding
    assert restored["particles"].sharding.is_equivalent_to(sharding, 2)
