"""Tempered-SMC breadth: evidence (normalizing-constant) recovery, vmapped
batched runs, and the waste-free strategy's end-to-end and error contracts.

Scenario parity targets in the reference suite:
``tests/smc/test_tempered_smc.py`` (NormalizingConstantTest,
BatchedTemperedSMCTest) and ``tests/smc/test_waste_free_smc.py``.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.smc import resampling
from blackjax_tpu.smc.base import extend_params
from blackjax_tpu.smc.waste_free import update_waste_free, waste_free_smc


def _conjugate_pair(d=1, prior_var=1.0, lik_var=0.25, y=0.5):
    """N(0, prior_var I) prior, N(y | x, lik_var I) likelihood: analytic
    log-evidence is the marginal N(y; 0, prior_var + lik_var) density."""
    logprior = lambda x: jnp.sum(
        -0.5 * x**2 / prior_var - 0.5 * jnp.log(2 * jnp.pi * prior_var)
    )
    loglik = lambda x: jnp.sum(
        -0.5 * (y - x) ** 2 / lik_var - 0.5 * jnp.log(2 * jnp.pi * lik_var)
    )
    log_evidence = float(
        d
        * (
            -0.5 * y**2 / (prior_var + lik_var)
            - 0.5 * np.log(2 * np.pi * (prior_var + lik_var))
        )
    )
    return logprior, loglik, log_evidence


def _hmc_kernel_args(d):
    return (
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        extend_params(
            {
                "step_size": 0.25,
                "inverse_mass_matrix": jnp.eye(d),
                "num_integration_steps": 8,
            }
        ),
    )


def _run_fixed_schedule(algo, key, particles, schedule):
    state = algo.init(particles)

    def body(carry, lam):
        key, state = carry
        key, sub = jax.random.split(key)
        state, info = algo.step(sub, state, lam)
        return (key, state), info.log_likelihood_increment

    (_, final), increments = jax.lax.scan(body, (key, state), schedule)
    return final, jnp.sum(increments)


def test_normalizing_constant_recovery(rng_key):
    """The summed log-likelihood increments of the full tempering pass are
    an estimate of the analytic log-evidence of the conjugate pair."""
    d = 2
    logprior, loglik, log_Z = _conjugate_pair(d=d)
    algo = blackjax_tpu.tempered_smc(
        logprior, loglik, *_hmc_kernel_args(d), resampling.systematic,
        num_mcmc_steps=5,
    )
    init_key, run_key = jax.random.split(rng_key)
    particles = jax.random.normal(init_key, (3000, d))
    schedule = jnp.linspace(0.05, 1.0, 20)
    _, log_Z_hat = _run_fixed_schedule(algo, run_key, particles, schedule)
    np.testing.assert_allclose(float(log_Z_hat), log_Z, atol=0.1)


def test_normalizing_constant_dimension_scaling(rng_key):
    """Evidence factorizes over dimensions: the d=4 estimate must be ~4x the
    d=1 analytic value (each coordinate contributes identically)."""
    logprior, loglik, log_Z_1 = _conjugate_pair(d=1)
    d = 4
    logprior4, loglik4, log_Z_4 = _conjugate_pair(d=d)
    assert abs(log_Z_4 - 4 * log_Z_1) < 1e-12
    algo = blackjax_tpu.tempered_smc(
        logprior4, loglik4, *_hmc_kernel_args(d), resampling.systematic,
        num_mcmc_steps=5,
    )
    init_key, run_key = jax.random.split(rng_key)
    particles = jax.random.normal(init_key, (3000, d))
    _, log_Z_hat = _run_fixed_schedule(
        algo, run_key, particles, jnp.linspace(0.05, 1.0, 20)
    )
    np.testing.assert_allclose(float(log_Z_hat), log_Z_4, atol=0.2)


def test_tempered_smc_vmapped_over_runs(rng_key):
    """The whole fixed-schedule loop vmaps over independent replicas (the
    chain-parallel idiom): per-replica evidences agree with the analytic
    value and are not all identical."""
    d = 2
    logprior, loglik, log_Z = _conjugate_pair(d=d)
    algo = blackjax_tpu.tempered_smc(
        logprior, loglik, *_hmc_kernel_args(d), resampling.systematic,
        num_mcmc_steps=4,
    )
    n_runs, n_particles = 4, 800
    schedule = jnp.linspace(0.1, 1.0, 10)

    def one_run(key):
        init_key, run_key = jax.random.split(key)
        particles = jax.random.normal(init_key, (n_particles, d))
        final, log_Z_hat = _run_fixed_schedule(algo, run_key, particles, schedule)
        return log_Z_hat, jnp.average(final.particles, axis=0, weights=final.weights)

    log_Zs, means = jax.jit(jax.vmap(one_run))(jax.random.split(rng_key, n_runs))
    np.testing.assert_allclose(np.asarray(log_Zs), log_Z, atol=0.25)
    assert len(np.unique(np.asarray(log_Zs))) == n_runs
    # posterior mean of the conjugate pair: y * prior/(prior+lik) = 0.4
    np.testing.assert_allclose(np.asarray(means), 0.4, atol=0.1)


def test_adaptive_tempered_smc_vmapped_over_runs(rng_key):
    """The adaptive loop (while_loop inside) also vmaps across replicas."""
    d = 2
    logprior, loglik, _ = _conjugate_pair(d=d)
    algo = blackjax_tpu.adaptive_tempered_smc(
        logprior, loglik, *_hmc_kernel_args(d), resampling.systematic,
        target_ess=0.6, num_mcmc_steps=4,
    )

    def one_run(key):
        init_key, run_key = jax.random.split(key)
        particles = jax.random.normal(init_key, (500, d))
        state = algo.init(particles)

        def cond(carry):
            _, state, n = carry
            return (state.tempering_param < 1.0) & (n < 30)

        def body(carry):
            key, state, n = carry
            key, sub = jax.random.split(key)
            state, _ = algo.step(sub, state)
            return key, state, n + 1

        _, final, n_steps = jax.lax.while_loop(cond, body, (run_key, state, 0))
        return final.tempering_param, n_steps

    lams, steps = jax.jit(jax.vmap(one_run))(jax.random.split(rng_key, 3))
    np.testing.assert_allclose(np.asarray(lams), 1.0)
    assert (np.asarray(steps) > 1).all() and (np.asarray(steps) < 30).all()


# ---------------------------------------------------------------------------
# waste-free strategy
# ---------------------------------------------------------------------------


def test_waste_free_adaptive_tempered_posterior(rng_key):
    d = 2
    logprior, loglik, _ = _conjugate_pair(d=d)
    n_particles, p = 1200, 6
    kernel, init, params = _hmc_kernel_args(d)
    algo = blackjax_tpu.adaptive_tempered_smc(
        logprior, loglik, kernel, init, params, resampling.systematic,
        target_ess=0.6, num_mcmc_steps=None,
        update_strategy=waste_free_smc(n_particles, p),
    )
    init_key, run_key = jax.random.split(rng_key)
    state = algo.init(jax.random.normal(init_key, (n_particles, d)))
    n = 0
    while float(state.tempering_param) < 1.0 and n < 30:
        run_key, sub = jax.random.split(run_key)
        state, _ = jax.jit(algo.step)(sub, state)
        n += 1
    assert float(state.tempering_param) == 1.0
    mean = np.average(
        np.asarray(state.particles), axis=0, weights=np.asarray(state.weights)
    )
    np.testing.assert_allclose(mean, 0.4, atol=0.1)


def test_waste_free_update_keeps_seeds_and_chain_states(rng_key):
    """The output cloud is exactly [seeds; all chain states]: with a frozen
    kernel every output particle equals its seed."""
    n, p = 60, 3
    seeds = jax.random.normal(rng_key, (n // p, 2))

    def frozen_step(key, state, logdensity_fn):
        return state, None

    update, num_resampled = update_waste_free(
        blackjax_tpu.mcmc.random_walk.init,
        lambda x: jnp.zeros(()),
        frozen_step,
        n_particles=n,
        p=p,
        num_resampled=n // p,
    )
    assert num_resampled == n // p
    out, _ = update(jax.random.split(rng_key, n // p), seeds, {})
    assert out.shape == (n, 2)
    # layout: the seed block first, then the chain states seed-major
    expected = np.concatenate(
        [np.asarray(seeds), np.repeat(np.asarray(seeds), p - 1, axis=0)]
    )
    np.testing.assert_allclose(np.asarray(out), expected)


def test_waste_free_update_multivariable_particles(rng_key):
    """Pytree particles keep their per-variable shapes through the
    seed+chain flattening."""
    n, p = 40, 4
    seeds = {
        "a": jax.random.normal(rng_key, (n // p, 3)),
        "b": jax.random.normal(jax.random.fold_in(rng_key, 1), (n // p,)),
    }
    logpost = lambda x: -0.5 * (jnp.sum(x["a"] ** 2) + x["b"] ** 2)

    def rw_step(key, state, logdensity_fn):
        return blackjax_tpu.additive_step_random_walk.build_kernel()(
            key,
            state,
            logdensity_fn,
            lambda k, pos: jax.tree.map(
                lambda leaf, kk: 0.1 * jax.random.normal(kk, jnp.shape(leaf)),
                pos,
                jax.tree.unflatten(jax.tree.structure(pos), list(jax.random.split(k, 2))),
            ),
        )

    update, _ = update_waste_free(
        blackjax_tpu.mcmc.random_walk.init, logpost, rw_step,
        n_particles=n, p=p, num_resampled=n // p,
    )
    out, _ = update(jax.random.split(rng_key, n // p), seeds, {})
    assert out["a"].shape == (n, 3)
    assert out["b"].shape == (n,)


def test_waste_free_rejects_num_mcmc_steps():
    with pytest.raises(ValueError, match="num_mcmc_steps"):
        update_waste_free(
            blackjax_tpu.mcmc.random_walk.init,
            lambda x: 0.0,
            lambda *a, **k: None,
            n_particles=100,
            p=4,
            num_resampled=25,
            num_mcmc_steps=7,
        )


def test_waste_free_rejects_non_divisor_p():
    with pytest.raises(ValueError, match="divide"):
        waste_free_smc(100, 3)
