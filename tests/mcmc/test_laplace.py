"""Laplace-marginal machinery: exact marginal recovery on a conjugate
Gaussian model and the Laplace-HMC sampler end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc.laplace_marginal import laplace_marginal_factory
from blackjax_tpu.util import run_inference_algorithm

N_LATENT = 5
Y_OBS = jnp.array([0.5, -0.2, 1.0, 0.3, -0.8])


def log_joint(theta, phi):
    """phi ~ N(0,1); theta_i | phi ~ N(phi, 1); y_i | theta_i ~ N(theta_i, 1).

    Gaussian everywhere, so the Laplace marginal over theta is EXACT:
    marginally y_i | phi ~ N(phi, 2), so
    log p(phi | y) = logpdf_N(phi; 0, 1) + sum_i logpdf_N(y_i; phi, 2) + C.
    """
    lp_phi = -0.5 * phi**2
    lp_theta = -0.5 * jnp.sum((theta - phi) ** 2)
    lp_y = -0.5 * jnp.sum((Y_OBS - theta) ** 2)
    return (lp_phi + lp_theta + lp_y).squeeze()


def exact_log_marginal(phi):
    return float(
        -0.5 * phi**2
        - 0.5 * np.sum((np.asarray(Y_OBS) - phi) ** 2 / 2.0)
        - 0.5 * N_LATENT * np.log(2 * np.pi * 2.0)
        - 0.5 * np.log(2 * np.pi) * 0  # constant shift irrelevant; see below
    )


def test_laplace_marginal_matches_exact_difference():
    laplace = laplace_marginal_factory(log_joint, jnp.zeros(N_LATENT), maxiter=50)
    lp0, theta0 = laplace(jnp.asarray(0.0))
    lp1, theta1 = laplace(jnp.asarray(1.0))
    # constants cancel in differences; the Laplace marginal is exact here
    expected_diff = exact_log_marginal(1.0) - exact_log_marginal(0.0)
    np.testing.assert_allclose(float(lp1 - lp0), expected_diff, atol=1e-4)
    # the mode theta* = (phi + y) / 2
    np.testing.assert_allclose(
        np.asarray(theta1), (1.0 + np.asarray(Y_OBS)) / 2.0, atol=1e-4
    )


def test_laplace_marginal_gradient():
    laplace = laplace_marginal_factory(log_joint, jnp.zeros(N_LATENT), maxiter=50)
    grad = jax.grad(lambda p: laplace(p)[0])(jnp.asarray(0.3))
    # exact gradient: -phi + sum_i (y_i - phi) / 2
    expected = -0.3 + float(jnp.sum(Y_OBS - 0.3)) / 2.0
    np.testing.assert_allclose(float(grad), expected, atol=1e-4)


def test_laplace_hmc_samples_posterior(rng_key):
    algo = blackjax_tpu.laplace_hmc(
        log_joint,
        theta_init=jnp.zeros(N_LATENT),
        step_size=0.3,
        inverse_mass_matrix=jnp.ones(1),
        num_integration_steps=8,
        maxiter=50,
    )
    state = algo.init(jnp.zeros(1))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 1000, initial_state=state)
    samples = np.asarray(states.position)[200:].reshape(-1)
    # posterior of phi: precision 1 + N/2, mean = sum(y)/2 / (1 + N/2)
    post_prec = 1.0 + N_LATENT / 2.0
    post_mean = float(jnp.sum(Y_OBS)) / 2.0 / post_prec
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.15)
    np.testing.assert_allclose(samples.var(), 1.0 / post_prec, rtol=0.4)
    assert not np.asarray(infos.lbfgs_hit_maxiter).any()


def test_laplace_dhmc_samples_posterior(rng_key):
    """The drawn-length variant must hit the same analytic posterior as
    laplace_hmc (same marginal machinery, dynamic trajectory lengths)."""
    algo = blackjax_tpu.laplace_dhmc(
        log_joint,
        theta_init=jnp.zeros(N_LATENT),
        step_size=0.3,
        inverse_mass_matrix=jnp.ones(1),
        maxiter=50,
    )
    state = algo.init(jnp.zeros(1), jax.random.key(7))
    _, (states, infos) = run_inference_algorithm(
        rng_key, algo, 1000, initial_state=state
    )
    samples = np.asarray(states.position)[200:].reshape(-1)
    post_prec = 1.0 + N_LATENT / 2.0
    post_mean = float(jnp.sum(Y_OBS)) / 2.0 / post_prec
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.15)
    np.testing.assert_allclose(samples.var(), 1.0 / post_prec, rtol=0.4)


def test_laplace_mhmc_multinomial_variant(rng_key):
    """The multinomial-proposal variant samples the same posterior."""
    algo = blackjax_tpu.laplace_mhmc(
        log_joint,
        theta_init=jnp.zeros(N_LATENT),
        step_size=0.3,
        inverse_mass_matrix=jnp.ones(1),
        num_integration_steps=8,
        maxiter=50,
    )
    state = algo.init(jnp.zeros(1))
    _, (states, _) = run_inference_algorithm(
        rng_key, algo, 1000, initial_state=state
    )
    samples = np.asarray(states.position)[200:].reshape(-1)
    post_prec = 1.0 + N_LATENT / 2.0
    post_mean = float(jnp.sum(Y_OBS)) / 2.0 / post_prec
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.15)
