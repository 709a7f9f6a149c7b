"""Pallas kernels under ``shard_map`` over the chains mesh (interpret mode
on the 8-device virtual CPU mesh — SURVEY §4's stated analogue of the fake
backend for Pallas, implication (e)).

Chains are independent, so each device's kernel call runs its shard with no
cross-device synchronization; the contract tested here is that the sharded
composition is EXACTLY the concatenation of the per-shard single-device
runs. The dc machine's counter-based RNG is keyed on (seed, local chain,
step, ...) with LOCAL lane ids, so mesh use must derive a per-shard seed
(``base_seed + axis_index``) — the pattern both tests pin.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, PartitionSpec as P

import importlib

# ops/__init__ re-exports the fused_hmc CLASS under the module's name, so
# plain `import ... as` resolves to the class; load the module explicitly
fhmc = importlib.import_module("blackjax_tpu.ops.fused_hmc")
from blackjax_tpu.ops.fused_leapfrog import make_gaussian_target
from blackjax_tpu.ops.fused_nuts_dc import (
    fused_nuts_run_dc,
    make_gaussian_target_dc,
)

N_DEV = 8
DIM = 4
VAR = jnp.array([1.0, 4.0, 0.25, 2.0])


def chains_mesh():
    return Mesh(np.array(jax.devices()[:N_DEV]), ("chains",))


def test_fused_nuts_dc_under_shard_map(rng_key):
    """dc NUTS machine per-shard inside shard_map == the 8 single-device
    runs, bit-for-bit (per-shard seed = base + axis_index)."""
    target = make_gaussian_target_dc(DIM, VAR)
    c_local, S, base_seed = 16, 6, 11
    C = c_local * N_DEV
    x0 = 0.3 * jax.random.normal(rng_key, (C, DIM), jnp.float32)

    def run_shard(positions):
        seed = base_seed + jax.lax.axis_index("chains")
        fx, hist, grads, steps = fused_nuts_run_dc(
            positions,
            jnp.ones(DIM),
            0.4,
            target=target,
            num_steps=S,
            max_num_doublings=4,
            seed=seed,
            num_track=DIM,
            budget=32 * S,
            chunk=16,
            interpret=True,
        )
        return fx, hist, grads[None], steps

    mesh = chains_mesh()
    sharded = jax.shard_map(
        run_shard,
        mesh=mesh,
        in_specs=(P("chains"),),
        out_specs=(P("chains"), P("chains"), P("chains"), P("chains")),
        check_vma=False,
    )
    fx_s, hist_s, grads_s, steps_s = sharded(x0)
    assert np.asarray(steps_s).min() == S
    assert np.isfinite(np.asarray(hist_s)).all()

    # single-device reference: the same per-shard blocks and seeds
    for i in range(N_DEV):
        blk = x0[i * c_local : (i + 1) * c_local]
        fx_i, hist_i, grads_i, steps_i = fused_nuts_run_dc(
            blk,
            jnp.ones(DIM),
            0.4,
            target=target,
            num_steps=S,
            max_num_doublings=4,
            seed=base_seed + i,
            num_track=DIM,
            budget=32 * S,
            chunk=16,
            interpret=True,
        )
        sl = slice(i * c_local, (i + 1) * c_local)
        np.testing.assert_array_equal(np.asarray(fx_s)[sl], np.asarray(fx_i))
        np.testing.assert_array_equal(
            np.asarray(hist_s)[sl], np.asarray(hist_i)
        )
        np.testing.assert_array_equal(float(grads_s[i]), float(grads_i))


def test_fused_hmc_under_shard_map(rng_key):
    """fused_hmc (cd-layout Pallas leapfrog) per-shard inside shard_map ==
    the concatenated single-device runs with the same per-shard keys."""
    target = make_gaussian_target(DIM, VAR)
    c_local, n_steps = 16, 3
    C = c_local * N_DEV
    key_pos, key_run = jax.random.split(rng_key)
    x0 = 0.3 * jax.random.normal(key_pos, (C, DIM), jnp.float32)
    step_keys = jax.random.split(key_run, (n_steps, N_DEV))

    algo = fhmc.as_top_level_api(
        target, 0.3, jnp.ones(DIM), 8, interpret=True
    )

    def run_shard(keys, positions):
        keys = keys.reshape((keys.shape[0],))  # (n_steps, 1) shard -> flat
        state = algo.init(positions)

        def one(state, key):
            state, info = algo.step(key, state)
            return state, info.acceptance_rate

        state, acc = jax.lax.scan(one, state, keys)
        return state.positions, acc

    mesh = chains_mesh()
    sharded = jax.shard_map(
        run_shard,
        mesh=mesh,
        in_specs=(P(None, "chains"), P("chains")),
        out_specs=(P("chains"), P(None, "chains")),
        check_vma=False,
    )
    pos_s, acc_s = sharded(step_keys, x0)
    assert np.isfinite(np.asarray(pos_s)).all()

    for i in range(N_DEV):
        blk = x0[i * c_local : (i + 1) * c_local]
        pos_i, acc_i = run_shard(step_keys[:, i : i + 1], blk)
        sl = slice(i * c_local, (i + 1) * c_local)
        np.testing.assert_array_equal(np.asarray(pos_s)[sl], np.asarray(pos_i))
        np.testing.assert_array_equal(
            np.asarray(acc_s)[:, sl], np.asarray(acc_i)
        )
