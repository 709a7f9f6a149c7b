"""SGMCMC: gradient estimators and sampler sanity on a Gaussian with
minibatched likelihood."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.sgmcmc import gradients

DATA_SIZE = 1000


def _setup(rng_key):
    # y_i ~ N(theta, 1), theta ~ N(0, 10); data generated at theta*=1
    data = 1.0 + jax.random.normal(rng_key, (DATA_SIZE, 1))
    logprior = lambda theta: -0.5 * jnp.sum(theta**2) / 10.0
    loglik = lambda theta, y: -0.5 * jnp.sum((y - theta) ** 2)
    grad_fn = gradients.grad_estimator(logprior, loglik, DATA_SIZE)
    post_mean = data.sum() / (DATA_SIZE + 0.1)
    return data, grad_fn, float(post_mean)


def _run(step_fn, init_state, data, rng_key, num_steps=3000, batch=100):
    def body(carry, key):
        state = carry
        batch_key, step_key = jax.random.split(key)
        idx = jax.random.randint(batch_key, (batch,), 0, DATA_SIZE)
        state = step_fn(step_key, state, data[idx], 1e-3)
        return state, state

    keys = jax.random.split(rng_key, num_steps)
    _, states = jax.lax.scan(body, init_state, keys)
    return states


def test_sgld(rng_key):
    data, grad_fn, post_mean = _setup(rng_key)
    algo = blackjax_tpu.sgld(grad_fn)
    position = jnp.zeros(1)
    states = _run(jax.jit(algo.step), algo.init(position), data, rng_key)
    samples = np.asarray(states)[500:]
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.2)


def test_sghmc(rng_key):
    data, grad_fn, post_mean = _setup(rng_key)
    algo = blackjax_tpu.sghmc(grad_fn, num_integration_steps=5)
    position = jnp.zeros(1)
    states = _run(jax.jit(algo.step), algo.init(position), data, rng_key)
    samples = np.asarray(states)[500:]
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.2)


def test_sgnht(rng_key):
    data, grad_fn, post_mean = _setup(rng_key)
    algo = blackjax_tpu.sgnht(grad_fn)
    state = algo.init(jnp.zeros(1), rng_key)
    states = _run(jax.jit(algo.step), state, data, rng_key)
    samples = np.asarray(states.position)[500:]
    np.testing.assert_allclose(samples.mean(), post_mean, atol=0.2)


def test_control_variates_reduce_variance(rng_key):
    data, grad_fn, post_mean = _setup(rng_key)
    cv_grad = gradients.control_variates(grad_fn, jnp.array([post_mean]), data)
    position = jnp.array([post_mean + 0.01])
    keys = jax.random.split(rng_key, 100)

    def grads_of(fn):
        def one(key):
            idx = jax.random.randint(key, (50,), 0, DATA_SIZE)
            return fn(position, data[idx])

        return jax.vmap(one)(keys)

    plain_var = np.var(np.asarray(grads_of(grad_fn)))
    cv_var = np.var(np.asarray(grads_of(cv_grad)))
    assert cv_var < plain_var * 0.1


def test_csgld_runs(rng_key):
    data, grad_fn, post_mean = _setup(rng_key)
    logprior = lambda theta: -0.5 * jnp.sum(theta**2) / 10.0
    loglik = lambda theta, y: -0.5 * jnp.sum((y - theta) ** 2)
    logdensity_est = gradients.logdensity_estimator(logprior, loglik, DATA_SIZE)
    algo = blackjax_tpu.csgld(
        logdensity_est, grad_fn, num_partitions=64, energy_gap=20.0, min_energy=400.0
    )
    state = algo.init(jnp.zeros(1))
    step = jax.jit(algo.step)
    for i in range(20):
        key = jax.random.fold_in(rng_key, i)
        batch_key, step_key = jax.random.split(key)
        idx = jax.random.randint(batch_key, (100,), 0, DATA_SIZE)
        state = step(step_key, state, data[idx], 1e-3)
    assert np.isfinite(np.asarray(state.position)).all()
    np.testing.assert_allclose(float(state.energy_pdf.sum()), 1.0, atol=1e-3)
