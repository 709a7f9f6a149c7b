"""Dispatch pins for the device-resident drivers: the whole program must
lower as ONE jitted computation.

An un-jitted ``jax.shard_map`` executes eagerly — one lowering/dispatch per
outer primitive — which on a tunneled TPU turns the single-crossing driver
into a per-primitive host round-trip storm (measured 9.4 s vs 60 ms for the
full adaptive-tempering run, round 5). These pins count jit lowerings via
``jax._src.test_util`` so a regression to eager shard_map fails loudly: the
fixed drivers lower ~6 computations per fresh cache (device_puts + the one
shard_mapped program); the eager spelling lowered 20+ on the same workload.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec

import blackjax_tpu
from blackjax_tpu.mcmc import mala
from blackjax_tpu.parallel import eca
from blackjax_tpu.parallel import smc as psmc

jtu = pytest.importorskip("jax._src.test_util")

NUM_DEVICES = 8


@pytest.fixture
def mesh():
    devices = jax.devices()
    if len(devices) < NUM_DEVICES:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devices[:NUM_DEVICES]), ("particles",))


@pytest.fixture
def chains_mesh():
    devices = jax.devices()
    if len(devices) < NUM_DEVICES:
        pytest.skip("needs 8 virtual devices")
    return Mesh(np.array(devices[:NUM_DEVICES]), ("chains",))


def test_smc_driver_single_lowering(mesh, rng_key):
    init = 2.0 * jax.random.normal(rng_key, (64, 2))
    jax.clear_caches()  # a fresh cache makes the lowering count meaningful

    # static config built ONCE: the driver's program cache is keyed on
    # function identity (like jit itself), so rebuilding the kernel or the
    # log-density lambdas per call would legitimately re-trace
    kernel = mala.build_kernel()
    logprior = lambda x: -0.5 * jnp.sum(x**2) / 9.0
    loglik = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)

    def run():
        return psmc.run_adaptive_tempered_smc(
            jax.random.fold_in(rng_key, 1),
            init,
            logprior,
            loglik,
            kernel,
            mala.init,
            {"step_size": 0.2},
            mesh,
            target_ess=0.6,
            num_mcmc_steps=3,
            max_steps=30,
        )

    with jtu.count_jit_and_pmap_lowerings() as count:
        result = run()
        jax.block_until_ready(result.particles)
    assert count() <= 10, (
        f"run_adaptive_tempered_smc lowered {count()} computations — the "
        "shard_mapped tempering loop must be jitted (eager shard_map "
        "dispatches per primitive; measured 20+ lowerings / 40x wall)"
    )
    # and the second call with identical shapes must be fully cached
    with jtu.count_jit_and_pmap_lowerings() as count2:
        result = run()
        jax.block_until_ready(result.particles)
    assert count2() == 0, "second identical-shape run must not re-lower"


def test_run_eca_single_lowering(chains_mesh, rng_key):
    num_chains, dim = 32, 4
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    kernel_impl = blackjax_tpu.mala.build_kernel()

    def kernel(key, state, adaptation_state):
        return kernel_impl(key, state, logdensity, 0.5)

    def summary_statistics_fn(state, info, key):
        return {"acc": info.acceptance_rate}

    def adaptation_update(adaptation_state, E):
        return adaptation_state + 1, {"acc": E["acc"]}

    from types import SimpleNamespace

    adap = SimpleNamespace(
        initial_state=jnp.asarray(0),
        summary_statistics_fn=summary_statistics_fn,
        update=adaptation_update,
        while_cond=None,
    )

    positions = jax.device_put(
        jax.random.normal(rng_key, (num_chains, dim)),
        NamedSharding(chains_mesh, PartitionSpec("chains")),
    )
    states = jax.jit(
        jax.vmap(lambda p: blackjax_tpu.mala.init(p, logdensity)),
        out_shardings=NamedSharding(chains_mesh, PartitionSpec("chains")),
    )(positions)
    jax.clear_caches()

    with jtu.count_jit_and_pmap_lowerings() as count:
        final_state, final_adaptation, info = eca.run_eca(
            rng_key,
            states,
            kernel,
            adap,
            num_steps=8,
            num_chains=num_chains,
            mesh=chains_mesh,
        )
        jax.block_until_ready(final_state.position)
    assert count() <= 10, (
        f"run_eca lowered {count()} computations — the shard_mapped "
        "ensemble loop must be jitted"
    )
