"""Inner-kernel tuning composed with each SMC family, plus the
tuning+pretuning double composition.

Scenario parity target: ``tests/smc/test_inner_kernel_tuning.py`` in the
reference suite (SMCParameterTuningTest, InnerKernelTuningJitTest,
MultipleTuningTest).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.smc import (
    adaptive_persistent_sampling,
    adaptive_tempered,
    inner_kernel_tuning,
    persistent_sampling,
    pretuning,
    resampling,
    tempered,
)
from blackjax_tpu.smc.base import extend_params
from blackjax_tpu.smc.tuning.from_kernel_info import update_scale_from_acceptance_rate
from blackjax_tpu.smc.tuning.from_particles import (
    inverse_mass_matrix_from_particles,
    particles_stds,
)


def _gaussian_pair(scale=2.0):
    logprior = lambda x: -0.5 * jnp.sum(x**2 / scale**2) - jnp.log(
        2 * jnp.pi * scale**2
    )
    loglik = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    return logprior, loglik


def _hmc_params(d=2):
    return extend_params(
        {
            "step_size": 0.3,
            "inverse_mass_matrix": jnp.eye(d),
            "num_integration_steps": 8,
        }
    )


def _imm_update(key, state, info):
    """Standard tuning rule: diagonal IMM from the live particle cloud."""
    return extend_params(
        {"inverse_mass_matrix": inverse_mass_matrix_from_particles(state.particles)}
    ) | {}


def _imm_update_full(key, state, info):
    return {
        "step_size": jnp.full((1,), 0.3),
        "inverse_mass_matrix": inverse_mass_matrix_from_particles(state.particles)[
            None
        ],
        "num_integration_steps": jnp.full((1,), 8, dtype=int),
    }


def test_tuning_with_tempered_fixed_schedule(rng_key):
    """IMM re-tuned from the cloud at every step of a fixed lambda ladder;
    the final cloud must recover the posterior of the Gaussian pair."""
    logprior, loglik = _gaussian_pair()
    n = 1000
    algo = blackjax_tpu.inner_kernel_tuning(
        tempered.as_top_level_api,
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
        mcmc_parameter_update_fn=_imm_update_full,
        initial_parameter_value=_hmc_params(),
        num_mcmc_steps=4,
    )
    init_key, run_key = jax.random.split(rng_key)
    particles = 2.0 * jax.random.normal(init_key, (n, 2))
    state = algo.init(particles)
    step = jax.jit(functools.partial(algo.step))
    initial_imm = np.asarray(state.parameter_override["inverse_mass_matrix"])
    for lam in jnp.linspace(0.2, 1.0, 5):
        run_key, sub = jax.random.split(run_key)
        state, info = step(sub, state, tempering_param=lam)
    # the override was re-derived from the cloud (no longer the identity)
    final_imm = np.asarray(state.parameter_override["inverse_mass_matrix"])
    assert final_imm.shape == (1, 2, 2)
    assert not np.allclose(final_imm, initial_imm)
    # posterior of prior N(0, 4 I) x lik N(1, I): var = 1/(1/4+1) = 0.8
    mean = np.average(
        np.asarray(state.sampler_state.particles),
        axis=0,
        weights=np.asarray(state.sampler_state.weights),
    )
    np.testing.assert_allclose(mean, 0.8 * np.ones(2), atol=0.15)


def test_tuning_with_adaptive_tempered_rw_scale(rng_key):
    """Random-walk scale driven by the measured acceptance rate through
    ``update_scale_from_acceptance_rate`` on the adaptive-tempered loop."""
    logprior, loglik = _gaussian_pair()
    n = 500

    def rw_step(key, state, logdensity_fn, scale):
        return blackjax_tpu.additive_step_random_walk.build_kernel()(
            key,
            state,
            logdensity_fn,
            lambda k, pos: scale * jax.random.normal(k, jnp.shape(pos)),
        )

    def scale_update(key, state, info):
        rates = jnp.atleast_1d(jnp.mean(info.update_info.acceptance_rate))
        return {
            "scale": update_scale_from_acceptance_rate(
                jnp.full((1,), 0.5), rates
            )
        }

    algo = blackjax_tpu.inner_kernel_tuning(
        adaptive_tempered.as_top_level_api,
        logprior,
        loglik,
        rw_step,
        blackjax_tpu.additive_step_random_walk.init,
        resampling.systematic,
        mcmc_parameter_update_fn=scale_update,
        initial_parameter_value={"scale": jnp.full((1,), 0.5)},
        num_mcmc_steps=5,
        target_ess=0.5,
    )
    particles = jax.random.normal(rng_key, (n, 2))
    state = algo.init(particles)
    for i in range(4):
        state, info = jax.jit(algo.step)(jax.random.fold_in(rng_key, i), state)
        if float(state.sampler_state.tempering_param) >= 1.0:
            break
    scale = np.asarray(state.parameter_override["scale"])
    assert scale.shape == (1,)
    assert 0.0 < float(scale[0]) < 2.0
    assert float(scale[0]) != 0.5  # the rule actually ran


def test_tuning_with_persistent_sampling(rng_key):
    """Tuning composes with the persistent-sampling family (padded-history
    state): the override updates and the history advances."""
    logprior, loglik = _gaussian_pair()
    n, n_schedule = 400, 4
    algo = blackjax_tpu.inner_kernel_tuning(
        persistent_sampling.as_top_level_api,
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
        mcmc_parameter_update_fn=_imm_update_full,
        initial_parameter_value=_hmc_params(),
        num_mcmc_steps=3,
        n_schedule=n_schedule,
    )
    particles = 2.0 * jax.random.normal(rng_key, (n, 2))
    state = algo.init(particles)
    step = jax.jit(algo.step)
    for i, lam in enumerate(jnp.linspace(1.0 / n_schedule, 1.0, n_schedule)):
        state, info = step(jax.random.fold_in(rng_key, i), state, lmbda=lam)
    assert int(state.sampler_state.iteration) == n_schedule
    assert np.isfinite(float(state.sampler_state.log_Z))
    imm = np.asarray(state.parameter_override["inverse_mass_matrix"])
    assert not np.allclose(imm[0], np.eye(2))


def test_tuning_with_adaptive_persistent_sampling(rng_key):
    logprior, loglik = _gaussian_pair()
    n, n_schedule = 400, 8
    algo = blackjax_tpu.inner_kernel_tuning(
        adaptive_persistent_sampling.as_top_level_api,
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
        mcmc_parameter_update_fn=_imm_update_full,
        initial_parameter_value=_hmc_params(),
        num_mcmc_steps=3,
        n_schedule=n_schedule,
        target_ess=0.6,
    )
    particles = 2.0 * jax.random.normal(rng_key, (n, 2))
    state = algo.init(particles)
    step = jax.jit(algo.step)
    for i in range(n_schedule):
        if float(state.sampler_state.tempering_param) >= 1.0:
            break
        state, info = step(jax.random.fold_in(rng_key, i), state)
    assert float(state.sampler_state.tempering_param) > 0.0
    imm = np.asarray(state.parameter_override["inverse_mass_matrix"])
    assert not np.allclose(imm[0], np.eye(2))


def test_override_actually_feeds_the_next_step(rng_key):
    """Semantics pin: the tuned override must drive the NEXT outer step.
    Tuning step_size to ~0 freezes the following mutation entirely."""
    logprior, loglik = _gaussian_pair()
    n = 200

    def freeze_update(key, state, info):
        return extend_params(
            {
                "step_size": 1e-30,
                "inverse_mass_matrix": jnp.eye(2),
                "num_integration_steps": 4,
            }
        )

    algo = blackjax_tpu.inner_kernel_tuning(
        tempered.as_top_level_api,
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
        mcmc_parameter_update_fn=freeze_update,
        initial_parameter_value=_hmc_params(),
        num_mcmc_steps=4,
    )
    key1, key2, init_key = jax.random.split(rng_key, 3)
    particles = jax.random.normal(init_key, (n, 2))
    state = algo.init(particles)
    state, info1 = algo.step(key1, state, tempering_param=0.5)
    before = np.asarray(state.sampler_state.particles)
    state, info2 = algo.step(key2, state, tempering_param=0.6)
    after = np.asarray(state.sampler_state.particles)
    ancestors = np.asarray(info2.ancestors)
    # resampling still permutes, but the mutation moved nothing
    np.testing.assert_allclose(after, before[ancestors], atol=1e-9)


def test_tuning_pretuning_composition(rng_key):
    """Tune the IMM from the cloud while PRE-tuning a per-particle step-size
    distribution: inner_kernel_tuning wraps a pretuning-wrapped
    adaptive-tempered SMC (``smc_returns_state_with_parameter_override``)."""
    logprior, loglik = _gaussian_pair()
    n = 200
    key_ss, key_init, run_key = jax.random.split(rng_key, 3)

    initial_parameters = {
        "inverse_mass_matrix": extend_params(jnp.eye(2)),
        "step_size": jax.random.uniform(key_ss, (n,), minval=0.05, maxval=0.2),
        "num_integration_steps": jnp.full((1,), 6, dtype=int),
    }

    pretune_fn = pretuning.build_pretune(
        blackjax_tpu.hmc.init,
        blackjax_tpu.hmc.build_kernel(),
        alpha=2.0,
        n_particles=n,
        sigma_parameters={"step_size": jnp.array(0.02)},
        positive_parameters=["step_size"],
    )

    def pretuning_factory(
        logprior_fn,
        loglikelihood_fn,
        mcmc_step_fn,
        mcmc_init_fn,
        mcmc_parameters,
        resampling_fn,
        num_mcmc_steps,
        target_ess,
    ):
        return pretuning.as_top_level_api(
            functools.partial(
                adaptive_tempered.as_top_level_api, target_ess=target_ess
            ),
            logprior_fn,
            loglikelihood_fn,
            mcmc_step_fn,
            mcmc_init_fn,
            resampling_fn,
            num_mcmc_steps,
            mcmc_parameters,
            pretune_fn,
        )

    def imm_update(key, state, info):
        return {
            "inverse_mass_matrix": extend_params(
                inverse_mass_matrix_from_particles(state.sampler_state.particles)
            )
        }

    step = inner_kernel_tuning.build_kernel(
        pretuning_factory,
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
        mcmc_parameter_update_fn=imm_update,
        num_mcmc_steps=3,
        target_ess=0.5,
        smc_returns_state_with_parameter_override=True,
    )
    state = inner_kernel_tuning.init(
        adaptive_tempered.init, jax.random.normal(key_init, (n, 2)), initial_parameters
    )

    n_steps = 0
    while float(state.sampler_state.tempering_param) < 1.0 and n_steps < 20:
        run_key, sub = jax.random.split(run_key)
        state, info = jax.jit(step)(sub, state)
        n_steps += 1

    assert float(state.sampler_state.tempering_param) == 1.0
    # both layers updated their parameters: the pretuned per-particle
    # step sizes moved AND the tuned shared IMM left the identity
    assert state.parameter_override["step_size"].shape == (n,)
    assert (np.asarray(state.parameter_override["step_size"]) > 0).all()
    assert not np.allclose(
        np.asarray(state.parameter_override["inverse_mass_matrix"][0]), np.eye(2)
    )
    # integration-step count survived untouched (tuned by neither layer)
    np.testing.assert_array_equal(
        np.asarray(state.parameter_override["num_integration_steps"]), [6]
    )
