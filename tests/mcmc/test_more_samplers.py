"""Moment recovery for the long-tail samplers: Barker, slice (hyperplane +
coordinate), elliptical slice, periodic orbital, mGrad, RMHMC."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.util import run_inference_algorithm

LOC, SCALE = 0.5, 1.5


def logdensity(x):
    return -0.5 * jnp.sum(((x - LOC) / SCALE) ** 2)


def _check_moments(samples, atol_mean=0.25, atol_std=0.45):
    samples = np.asarray(samples).reshape(-1)
    assert abs(samples.mean() - LOC) < atol_mean, samples.mean()
    assert abs(samples.std() - SCALE) < atol_std, samples.std()


def test_barker(rng_key):
    algo = blackjax_tpu.barker(logdensity, step_size=0.8)
    state = algo.init(jnp.zeros(3))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 4000, initial_state=state)
    _check_moments(states.position[1000:])
    assert 0.2 < float(np.mean(np.asarray(infos.acceptance_rate))) < 1.0


def test_slice_sampling(rng_key):
    algo = blackjax_tpu.slice_sampling(logdensity)
    state = algo.init(jnp.zeros(3))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 4000, initial_state=state)
    _check_moments(states.position[500:])
    assert float(np.mean(np.asarray(infos.is_accepted))) > 0.95


def test_slice_stepping_out(rng_key):
    from blackjax_tpu.mcmc.slice import stepping_out

    algo = blackjax_tpu.slice_sampling(logdensity, interval=stepping_out)
    state = algo.init(jnp.zeros(3))
    _, (states, _) = run_inference_algorithm(rng_key, algo, 3000, initial_state=state)
    _check_moments(states.position[500:])


def test_coordinate_slice(rng_key):
    algo = blackjax_tpu.coordinate_slice(logdensity)
    state = algo.init(jnp.zeros(3))
    _, (states, _) = run_inference_algorithm(rng_key, algo, 1500, initial_state=state)
    _check_moments(states.position[300:])


def test_elliptical_slice(rng_key):
    # target = N(0, prior_cov) * likelihood; use likelihood = N(1, 1) with
    # prior N(0, 4): posterior precision 1/4+1 = 1.25, mean = 1/1.25 = 0.8
    loglik = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    algo = blackjax_tpu.elliptical_slice(loglik, mean=jnp.zeros(2), cov=4.0 * jnp.ones(2))
    state = algo.init(jnp.zeros(2))
    _, (states, _) = run_inference_algorithm(rng_key, algo, 4000, initial_state=state)
    samples = np.asarray(states.position)[500:]
    np.testing.assert_allclose(samples.mean(0), 0.8 * np.ones(2), atol=0.15)
    np.testing.assert_allclose(samples.var(0), 0.8 * np.ones(2), rtol=0.3)


def test_periodic_orbital(rng_key):
    algo = blackjax_tpu.orbital_hmc(
        logdensity, step_size=0.4, inverse_mass_matrix=jnp.ones(3), period=8
    )
    state = algo.init(jnp.zeros(3))
    _, (states, _) = run_inference_algorithm(rng_key, algo, 2000, initial_state=state)
    # weighted samples: use all positions with their weights
    positions = np.asarray(states.positions[500:]).reshape(-1, 3)
    weights = np.asarray(states.weights[500:]).reshape(-1)
    mean = np.average(positions, axis=0, weights=weights)
    np.testing.assert_allclose(mean, LOC * np.ones(3), atol=0.3)


def test_mgrad_gaussian(rng_key):
    # latent Gaussian model: prior N(0, C), loglik N(1, 1)
    C = jnp.array([[1.0, 0.3], [0.3, 1.0]])
    loglik = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    algo = blackjax_tpu.mgrad_gaussian(loglik, covariance=C, step_size=1.0)
    state = algo.init(jnp.zeros(2))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 5000, initial_state=state)
    samples = np.asarray(states.position)[1000:]
    prec = np.linalg.inv(np.asarray(C)) + np.eye(2)
    post_mean = np.linalg.solve(prec, np.ones(2))
    np.testing.assert_allclose(samples.mean(0), post_mean, atol=0.15)


def test_rmhmc(rng_key):
    algo = blackjax_tpu.rmhmc(
        logdensity,
        step_size=0.5,
        mass_matrix=lambda q: jnp.ones(3),
        num_integration_steps=8,
    )
    state = algo.init(jnp.zeros(3))
    _, (states, _) = run_inference_algorithm(rng_key, algo, 1500, initial_state=state)
    _check_moments(states.position[300:])


def test_gist_step_size(rng_key):
    algo = blackjax_tpu.gist_step_size(
        logdensity, jnp.ones(3), initial_step_size=0.5, num_integration_steps=5
    )
    state = algo.init(jnp.zeros(3))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 3000, initial_state=state)
    _check_moments(states.position[500:])
    assert float(np.mean(np.asarray(infos.is_accepted))) > 0.3


def test_gist_trajectory_length(rng_key):
    algo = blackjax_tpu.gist_trajectory_length(logdensity, jnp.ones(3), step_size=0.4)
    state = algo.init(jnp.zeros(3))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 3000, initial_state=state)
    _check_moments(states.position[500:])
    assert float(np.mean(np.asarray(infos.is_accepted))) > 0.3


def test_slice_constrained_support(rng_key):
    """Hard -inf boundaries (uniform on the unit box): every sample must stay
    in support and the moments must match U(0,1) (parity case:
    reference ``tests/mcmc/test_slice.py`` constrained targets)."""
    ld = lambda x: jnp.where(jnp.all((x > 0.0) & (x < 1.0)), 0.0, -jnp.inf)
    algo = blackjax_tpu.slice_sampling(ld)
    state = algo.init(jnp.array([0.5, 0.5]))
    step = jax.jit(algo.step)
    samples = []
    for i in range(3000):
        state, _ = step(jax.random.fold_in(rng_key, i), state)
        samples.append(state.position)
    xs = np.asarray(jnp.stack(samples))[500:]
    assert xs.min() > 0.0 and xs.max() < 1.0
    np.testing.assert_allclose(xs.mean(0), 0.5, atol=0.05)
    np.testing.assert_allclose(xs.var(0), 1.0 / 12.0, atol=0.02)


def test_slice_skewed_target_moments(rng_key):
    """Exponential(1) via its logdensity: mean == std == 1; slice sampling
    must handle the asymmetric slice without a gradient."""
    ld = lambda x: jnp.where(x[0] > 0.0, -x[0], -jnp.inf)
    algo = blackjax_tpu.coordinate_slice(ld)
    state = algo.init(jnp.array([1.0]))
    step = jax.jit(algo.step)
    samples = []
    for i in range(4000):
        state, _ = step(jax.random.fold_in(rng_key, i), state)
        samples.append(float(state.position[0]))
    xs = np.asarray(samples)[500:]
    np.testing.assert_allclose(xs.mean(), 1.0, atol=0.1)
    np.testing.assert_allclose(xs.std(), 1.0, atol=0.15)


def test_slice_pytree_positions(rng_key):
    """Dict positions ride through hyperplane slice init/step unchanged."""
    ld = lambda p: -0.5 * jnp.sum(p["a"] ** 2) - 0.5 * jnp.sum((p["b"] - 1.0) ** 2)
    algo = blackjax_tpu.slice_sampling(ld)
    state = algo.init({"a": jnp.zeros(2), "b": jnp.zeros(1)})
    step = jax.jit(algo.step)
    for i in range(200):
        state, _ = step(jax.random.fold_in(rng_key, i), state)
    assert state.position["a"].shape == (2,)
    assert np.isfinite(np.asarray(state.position["b"])).all()


def test_elliptical_slice_prior_invariance(rng_key):
    """With a constant likelihood the elliptical slice sampler's stationary
    distribution IS the Gaussian prior — an exactness invariant of the
    algorithm (every proposal is accepted, moments must match the prior)."""
    mean = jnp.array([1.0, -2.0])
    cov = jnp.array([[2.0, 0.8], [0.8, 1.0]])
    algo = blackjax_tpu.elliptical_slice(
        lambda x: jnp.asarray(0.0), mean=mean, cov=cov
    )
    state = algo.init(mean)
    step = jax.jit(algo.step)
    samples = []
    for i in range(6000):
        state, _ = step(jax.random.fold_in(rng_key, i), state)
        samples.append(state.position)
    xs = np.asarray(jnp.stack(samples))[500:]
    np.testing.assert_allclose(xs.mean(0), np.asarray(mean), atol=0.1)
    np.testing.assert_allclose(np.cov(xs.T), np.asarray(cov), atol=0.2)
