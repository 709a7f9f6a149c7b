"""Cross-chain adaptation: ChEES and MEADS end-to-end on an anisotropic
Gaussian (mirrors reference ``tests/mcmc/test_sampling.py:322-831``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import blackjax_tpu

VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def test_chees_adaptation(rng_key):
    num_chains = 64
    warm_key, init_key, sample_key = jax.random.split(rng_key, 3)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0

    warmup = blackjax_tpu.chees_adaptation(logdensity, num_chains)
    (last_states, parameters), info = warmup.run(
        warm_key, positions, 0.1, optax.adam(0.25), 400
    )
    assert np.isfinite(float(parameters["step_size"]))
    assert float(parameters["integration_steps_params"][0]) >= 1.0

    kernel = blackjax_tpu.dynamic_hmc(logdensity, **parameters).step

    def one_step(states, key):
        keys = jax.random.split(key, num_chains)
        states, infos = jax.vmap(kernel)(keys, states)
        return states, states.position

    keys = jax.random.split(sample_key, 300)
    _, positions_trace = jax.lax.scan(one_step, last_states, keys)
    samples = np.asarray(positions_trace[100:]).reshape(-1, 4)
    np.testing.assert_allclose(samples.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(samples.var(0), np.asarray(VARIANCES), rtol=0.3)


def test_chees_with_diagonal_mass_matrix(rng_key):
    num_chains = 64
    warm_key, init_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0
    warmup = blackjax_tpu.chees_adaptation(
        logdensity, num_chains, mass_matrix_estimation="diagonal"
    )
    (last_states, parameters), info = warmup.run(
        warm_key, positions, 0.1, optax.adam(0.25), 400
    )
    imm = np.asarray(parameters["inverse_mass_matrix"])
    # pooled variance estimate should roughly match target variances
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.5)


def test_meads_adaptation(rng_key):
    num_chains = 128
    warm_key, init_key, sample_key = jax.random.split(rng_key, 3)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0

    warmup = blackjax_tpu.meads_adaptation(logdensity, num_chains)
    (last_states, parameters), info = warmup.run(warm_key, positions, 400)
    assert np.isfinite(float(parameters["step_size"]))
    assert 0.0 < float(parameters["alpha"]) <= 1.0

    kernel = blackjax_tpu.ghmc(logdensity, **parameters).step

    def one_step(states, key):
        keys = jax.random.split(key, num_chains)
        states, infos = jax.vmap(kernel)(keys, states)
        return states, states.position

    keys = jax.random.split(sample_key, 400)
    _, positions_trace = jax.lax.scan(one_step, last_states, keys)
    samples = np.asarray(positions_trace[100:]).reshape(-1, 4)
    np.testing.assert_allclose(samples.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(samples.var(0), np.asarray(VARIANCES), rtol=0.3)


def test_maximum_eigenvalue_accuracy(rng_key):
    from blackjax_tpu.adaptation.meads_adaptation import maximum_eigenvalue

    # ratio estimator approximates sum(lam^2)/sum(lam) = 82.26/10.6 ~ 7.76,
    # a slight underestimate of lam_max = 9 by construction
    cov = jnp.diag(jnp.array([9.0, 1.0, 0.5, 0.1]))
    samples = jax.random.normal(rng_key, (2000, 4)) @ jnp.sqrt(cov)
    est = float(maximum_eigenvalue(samples))
    assert 6.5 < est < 9.5
