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


def test_kernels_preserve_pytree_structure(rng_key):
    """All four samplers must accept and return dict positions unchanged in
    structure (reference behavior: ``tests/sgmcmc/test_kernels.py``)."""
    data = jax.random.normal(rng_key, (DATA_SIZE, 1))
    logprior = lambda th: -0.5 * (jnp.sum(th["a"] ** 2) + jnp.sum(th["b"] ** 2))
    loglik = lambda th, y: -0.5 * jnp.sum((y - th["a"] - th["b"][0]) ** 2)
    grad_fn = gradients.grad_estimator(logprior, loglik, DATA_SIZE)
    position = {"a": jnp.zeros(1), "b": jnp.zeros(2)}
    minibatch = data[:50]

    for name, build in [
        ("sgld", lambda: blackjax_tpu.sgld(grad_fn)),
        ("sghmc", lambda: blackjax_tpu.sghmc(grad_fn, num_integration_steps=3)),
    ]:
        algo = build()
        out = algo.step(rng_key, algo.init(position), minibatch, 1e-3)
        assert jax.tree.structure(out) == jax.tree.structure(position), name
        assert out["b"].shape == (2,), name

    algo = blackjax_tpu.sgnht(grad_fn)
    state = algo.init(position, rng_key)
    out = algo.step(rng_key, state, minibatch, 1e-3)
    assert jax.tree.structure(out.position) == jax.tree.structure(position)


def test_sgld_temperature_zero_is_deterministic_ascent(rng_key):
    """At temperature 0 the Langevin noise vanishes: two different keys give
    the identical update, and it moves uphill along the posterior gradient."""
    data, grad_fn, post_mean = _setup(rng_key)
    algo = blackjax_tpu.sgld(grad_fn)
    minibatch = data[:100]
    pos = jnp.zeros(1)
    k1, k2 = jax.random.split(rng_key)
    out1 = algo.step(k1, pos, minibatch, 1e-4, temperature=0.0)
    out2 = algo.step(k2, pos, minibatch, 1e-4, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # the data were generated at theta*=1: from 0 the gradient points up
    assert float(out1[0]) > 0.0


def test_grad_estimator_is_unbiased(rng_key):
    """Averaged over random minibatches, the stochastic gradient must match
    the full-data gradient (the N/batch rescaling contract)."""
    data, grad_fn, _ = _setup(rng_key)
    logprior = lambda theta: -0.5 * jnp.sum(theta**2) / 10.0
    loglik = lambda theta, y: -0.5 * jnp.sum((y - theta) ** 2)
    full_grad = jax.grad(
        lambda th: logprior(th) + loglik(th, data)
    )(jnp.array([0.3]))

    def one(key):
        idx = jax.random.randint(key, (100,), 0, DATA_SIZE)
        return grad_fn(jnp.array([0.3]), data[idx])

    est = jax.vmap(one)(jax.random.split(rng_key, 4000)).mean(0)
    np.testing.assert_allclose(
        float(est[0]), float(full_grad[0]), rtol=0.05
    )


def test_csgld_zeta_zero_reduces_to_sgld(rng_key):
    """With zeta=0 the contour drift rescaling is exactly 1, so the position
    update must equal a plain SGLD step at the same temperature and key."""
    data, grad_fn, _ = _setup(rng_key)
    logprior = lambda theta: -0.5 * jnp.sum(theta**2) / 10.0
    loglik = lambda theta, y: -0.5 * jnp.sum((y - theta) ** 2)
    logdensity_est = gradients.logdensity_estimator(logprior, loglik, DATA_SIZE)

    temperature = 0.01
    csgld_algo = blackjax_tpu.csgld(
        logdensity_est, grad_fn, zeta=0.0, temperature=temperature
    )
    sgld_algo = blackjax_tpu.sgld(grad_fn)

    pos = jnp.array([0.4])
    minibatch = data[:100]
    out_c = csgld_algo.step(rng_key, csgld_algo.init(pos), minibatch, 1e-4)
    out_s = sgld_algo.step(rng_key, pos, minibatch, 1e-4, temperature=temperature)
    np.testing.assert_allclose(
        np.asarray(out_c.position), np.asarray(out_s), rtol=1e-12
    )


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


@pytest.mark.slow
def test_csgld_escapes_modes_where_sgld_sticks(rng_key):
    """Contour SGLD's flattened landscape must let the chain cross between
    two well-separated modes at low temperature, where plain low-temperature
    SGLD stays in its starting basin (Deng et al. 2022's headline property).
    Full-batch gradients isolate the landscape effect."""
    # mixture of N(-4, 0.5^2) and N(+4, 0.5^2)
    def logdensity(x):
        return jnp.squeeze(
            jax.nn.logsumexp(
                jnp.stack([-0.5 * (x - 4.0) ** 2 / 0.25, -0.5 * (x + 4.0) ** 2 / 0.25]),
                axis=0,
            )
        )

    grad_fn = lambda x, _minibatch: jax.grad(lambda y: jnp.sum(logdensity(y)))(x)
    logdensity_est = lambda x, _minibatch: jnp.sum(logdensity(x))
    num_steps = 6000

    def crossings(samples):
        signs = np.sign(samples)
        return int(np.sum(signs[1:] != signs[:-1]))

    # plain SGLD at the temperature CSGLD uses for its diffusion
    sgld = blackjax_tpu.sgld(grad_fn)
    pos = jnp.array([4.0])

    def sgld_body(p, key):
        p = sgld.step(key, p, None, 5e-3, temperature=0.05)
        return p, p[0]

    _, sgld_trace = jax.lax.scan(
        sgld_body, pos, jax.random.split(rng_key, num_steps)
    )

    csgld = blackjax_tpu.csgld(
        logdensity_est, grad_fn, zeta=200.0, temperature=0.05,
        num_partitions=80, energy_gap=0.5, min_energy=0.0,
    )

    def csgld_body(state, key):
        state = csgld.step(key, state, None, 5e-3, 0.03)
        return state, state.position[0]

    _, csgld_trace = jax.lax.scan(
        csgld_body, csgld.init(pos), jax.random.split(jax.random.fold_in(rng_key, 1), num_steps)
    )

    n_sgld = crossings(np.asarray(sgld_trace))
    n_csgld = crossings(np.asarray(csgld_trace))
    assert np.isfinite(np.asarray(csgld_trace)).all()
    assert n_sgld == 0, n_sgld  # stuck at low temperature
    assert n_csgld >= 2, n_csgld  # the flattened landscape lets it travel
