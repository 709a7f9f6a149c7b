"""Laplace-HMC state/info contracts: init consistency, warm-start carry,
jit/retrace discipline, latent recovery from MCMC states, L-BFGS alarm
semantics (mirrors ``tests/mcmc/test_laplace_hmc.py`` in the reference).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc.laplace_hmc import LaplaceHMCState, init as laplace_init
from blackjax_tpu.mcmc.laplace_marginal import (
    LaplaceHMCInfo,
    laplace_lbfgs_grad_evals,
    laplace_marginal_factory,
)

N_LATENT = 4
Y = jnp.array([0.6, -0.3, 1.1, 0.2])


def log_joint(theta, phi):
    lp_phi = -0.5 * phi**2
    lp_theta = -0.5 * jnp.sum((theta - phi) ** 2)
    lp_y = -0.5 * jnp.sum((Y - theta) ** 2)
    return (lp_phi + lp_theta + lp_y).squeeze()


def _algo(**kwargs):
    defaults = dict(
        theta_init=jnp.zeros(N_LATENT),
        step_size=0.3,
        inverse_mass_matrix=jnp.ones(1),
        num_integration_steps=8,
        maxiter=50,
    )
    defaults.update(kwargs)
    return blackjax_tpu.laplace_hmc(log_joint, **defaults)


@pytest.fixture(scope="module")
def laplace():
    return laplace_marginal_factory(log_joint, jnp.zeros(N_LATENT), maxiter=50)


# --- init contracts ---------------------------------------------------------
def test_init_returns_state_with_mode(laplace):
    state = laplace_init(jnp.zeros(1), laplace)
    assert isinstance(state, LaplaceHMCState)
    assert set(state._fields) == {
        "position",
        "logdensity",
        "logdensity_grad",
        "theta_star",
    }
    # theta* carried in the state equals a direct mode solve
    np.testing.assert_allclose(
        np.asarray(state.theta_star),
        np.asarray(laplace.solve_theta(jnp.zeros(1))),
        atol=1e-5,
    )


def test_init_logdensity_consistent(laplace):
    state = laplace_init(jnp.asarray([0.4]), laplace)
    value, _ = laplace(jnp.asarray([0.4]))
    np.testing.assert_allclose(float(state.logdensity), float(value), atol=1e-7)
    grad = jax.grad(lambda p: laplace(p)[0])(jnp.asarray([0.4]))
    np.testing.assert_allclose(
        np.asarray(state.logdensity_grad), np.asarray(grad), atol=1e-6
    )


# --- stepping contracts -----------------------------------------------------
def test_step_carries_finite_state_and_mode(rng_key):
    algo = _algo()
    state = algo.init(jnp.zeros(1))
    for key in jax.random.split(rng_key, 3):
        state, info = algo.step(key, state)
    assert isinstance(state, LaplaceHMCState)
    assert np.isfinite(float(state.logdensity))
    assert np.asarray(state.theta_star).shape == (N_LATENT,)
    assert np.isfinite(np.asarray(state.theta_star)).all()


def test_step_jit_no_excess_retracing(rng_key):
    algo = _algo()
    state = algo.init(jnp.zeros(1))
    step = jax.jit(algo.step)
    keys = jax.random.split(rng_key, 4)
    state, _ = step(keys[0], state)
    for key in keys[1:]:
        state, _ = step(key, state)
    assert step._cache_size() == 1


def test_info_fields_and_alarm_silent(rng_key):
    algo = _algo()
    state = algo.init(jnp.zeros(1))
    state, info = algo.step(rng_key, state)
    assert isinstance(info, LaplaceHMCInfo)
    # backward-compatible HMC fields
    for field in ("acceptance_rate", "is_accepted", "energy", "num_integration_steps"):
        assert hasattr(info, field)
    assert np.isfinite(float(info.lbfgs_error))
    assert int(info.lbfgs_iter_num) >= 0
    assert not bool(info.lbfgs_hit_maxiter)
    # grad-eval proxy is (L+1) * iters
    np.testing.assert_allclose(
        float(laplace_lbfgs_grad_evals(info)),
        (8 + 1) * float(info.lbfgs_iter_num),
    )


def test_hit_maxiter_fires_with_starved_budget(rng_key):
    """maxiter=1 cannot converge the inner solve from a cold start far from
    the mode: the silent-non-convergence alarm must fire."""
    algo = _algo(theta_init=10.0 + jnp.zeros(N_LATENT), maxiter=1)
    state = algo.init(jnp.asarray([3.0]))
    _, info = algo.step(rng_key, state)
    assert bool(info.lbfgs_hit_maxiter)


def test_error_small_when_converged(rng_key):
    algo = _algo()
    state = algo.init(jnp.zeros(1))
    _, info = algo.step(rng_key, state)
    if bool(info.lbfgs_converged):
        assert float(info.lbfgs_error) <= 1e-6


# --- recovering latents from a chain ----------------------------------------
def test_sample_theta_from_mcmc_states(rng_key, laplace):
    """Conditional latent draws along the phi chain recover the joint
    posterior mean of theta: E[theta_i | y] = (E[phi|y] + y_i) / 2."""
    from blackjax_tpu.util import run_inference_algorithm

    algo = _algo()
    state = algo.init(jnp.zeros(1))
    run_key, latent_key = jax.random.split(rng_key)
    _, (states, _) = run_inference_algorithm(
        run_key, algo, 1200, initial_state=state
    )
    phis = states.position[200:]
    modes = states.theta_star[200:]
    keys = jax.random.split(latent_key, phis.shape[0])
    draws = jax.vmap(laplace.sample_theta)(keys, phis, modes)

    post_prec = 1.0 + N_LATENT / 2.0
    phi_mean = float(jnp.sum(Y)) / 2.0 / post_prec
    expected_theta_mean = (phi_mean + np.asarray(Y)) / 2.0
    np.testing.assert_allclose(
        np.asarray(jnp.mean(draws, 0)), expected_theta_mean, atol=0.15
    )
