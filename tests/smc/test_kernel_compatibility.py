"""Every MCMC kernel family must compose with the SMC machinery.

Parity model: reference ``tests/smc/test_kernel_compatibility.py`` — one
adaptive-tempered SMC step with each inner kernel, checking the
(step_fn, init_fn, parameters) seam end-to-end.
"""
import functools

import jax
import jax.numpy as jnp
import pytest

import blackjax_tpu
from blackjax_tpu.smc import adaptive_tempered, resampling
from blackjax_tpu.smc.base import extend_params

N_PARTICLES = 128


def prior_log_prob(x):
    return -0.5 * jnp.sum(x**2)


def loglikelihood(x):
    return -0.5 * jnp.sum((x - 1.0) ** 2 / 0.5)


@pytest.fixture
def particles(rng_key):
    return jax.random.normal(rng_key, (N_PARTICLES, 2))


def _one_smc_step(rng_key, particles, mcmc_step_fn, mcmc_init_fn, mcmc_parameters):
    algo = adaptive_tempered.as_top_level_api(
        prior_log_prob,
        loglikelihood,
        mcmc_step_fn,
        mcmc_init_fn,
        mcmc_parameters=mcmc_parameters,
        resampling_fn=resampling.systematic,
        target_ess=0.5,
        num_mcmc_steps=1,
    )
    state = algo.init(particles)
    new_state, info = algo.step(jax.random.fold_in(rng_key, 7), state)
    assert jax.tree.leaves(new_state.particles)[0].shape[0] == N_PARTICLES
    assert 0.0 < float(new_state.tempering_param) <= 1.0
    return new_state


def test_compatible_with_rwm(rng_key, particles):
    from blackjax_tpu.mcmc.random_walk import normal

    rwm = blackjax_tpu.additive_step_random_walk.build_kernel()

    def kernel(rng_key, state, logdensity_fn, sigma):
        return rwm(rng_key, state, logdensity_fn, normal(sigma))

    _one_smc_step(
        rng_key, particles, kernel,
        blackjax_tpu.additive_step_random_walk.init,
        extend_params({"sigma": 0.3 * jnp.eye(2)}),
    )


def test_compatible_with_rmh(rng_key, particles):
    rmh = blackjax_tpu.rmh.build_kernel()

    def kernel(rng_key, state, logdensity_fn, proposal_mean):
        return rmh(
            rng_key,
            state,
            logdensity_fn,
            lambda key, pos: pos + proposal_mean
            + 0.2 * jax.random.normal(key, pos.shape),
        )

    _one_smc_step(
        rng_key, particles, kernel, blackjax_tpu.rmh.init,
        extend_params({"proposal_mean": jnp.zeros(2)}),
    )


def test_compatible_with_irmh(rng_key, particles):
    irmh = blackjax_tpu.irmh.build_kernel()

    def kernel(rng_key, state, logdensity_fn, scale):
        return irmh(
            rng_key,
            state,
            logdensity_fn,
            lambda key: scale * jax.random.normal(key, (2,)),
        )

    _one_smc_step(
        rng_key, particles, kernel, blackjax_tpu.irmh.init,
        extend_params({"scale": 1.5}),
    )


def test_compatible_with_hmc(rng_key, particles):
    _one_smc_step(
        rng_key,
        particles,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        extend_params(
            {
                "step_size": 0.2,
                "inverse_mass_matrix": jnp.ones(2),
                "num_integration_steps": 10,
            }
        ),
    )


def test_compatible_with_nuts(rng_key, particles):
    _one_smc_step(
        rng_key,
        particles,
        blackjax_tpu.nuts.build_kernel(),
        blackjax_tpu.nuts.init,
        extend_params({"step_size": 0.2, "inverse_mass_matrix": jnp.ones(2)}),
    )


def test_compatible_with_mala(rng_key, particles):
    _one_smc_step(
        rng_key,
        particles,
        blackjax_tpu.mala.build_kernel(),
        blackjax_tpu.mala.init,
        extend_params({"step_size": 0.1}),
    )
