"""Fused Pallas leapfrog tests (interpret mode on CPU).

Strategy per SURVEY.md §4.5: Pallas kernels run under
``pallas_call(interpret=True)`` on CPU and are checked for exact agreement
with the XLA velocity-Verlet integrator on the same trajectories.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc import integrators
from blackjax_tpu.ops import (
    fused_hmc,
    fused_leapfrog,
    get_registered_target,
    make_gaussian_target,
    make_hierarchical_gaussian_target,
)

DIM = 12
N_CHAINS = 20  # deliberately not a multiple of the sublane tile


@pytest.fixture(scope="module")
def hierarchical_target():
    return make_hierarchical_gaussian_target(DIM)


def _xla_trajectory(logdensity_fn, x0, m0, imm, step_size, num_steps):
    """Reference trajectory via the generic XLA velocity-Verlet."""
    from blackjax_tpu.mcmc.metrics import gaussian_euclidean

    metric = gaussian_euclidean(imm)
    step = integrators.velocity_verlet(logdensity_fn, metric.kinetic_energy)

    def init_state(x, m):
        logdensity, grad = jax.value_and_grad(logdensity_fn)(x)
        return integrators.IntegratorState(x, m, logdensity, grad)

    def one_chain(x, m):
        state = init_state(x, m)
        state = jax.lax.fori_loop(
            0, num_steps, lambda _, s: step(s, step_size), state
        )
        return state.position, state.momentum, state.logdensity

    return jax.vmap(one_chain)(x0, m0)


def test_fused_matches_xla_integrator(hierarchical_target, rng_key):
    kx, km = jax.random.split(rng_key)
    x0 = jax.random.normal(kx, (N_CHAINS, DIM), jnp.float32) * 0.5
    m0 = jax.random.normal(km, (N_CHAINS, DIM), jnp.float32)
    imm = jnp.full((DIM,), 1.3, jnp.float32)
    step_size, num_steps = 0.05, 7

    ld = lambda x: hierarchical_target.logdensity_fn(x)
    x_ref, m_ref, ld_ref = _xla_trajectory(ld, x0, m0, imm, step_size, num_steps)

    x_f, m_f, energy = fused_leapfrog(
        x0, m0, imm, step_size,
        target=hierarchical_target, num_steps=num_steps, tile_chains=8,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_ref), rtol=2e-4, atol=2e-4)
    expected_energy = -ld_ref + 0.5 * jnp.sum(m_ref**2 * imm, axis=1)
    np.testing.assert_allclose(
        np.asarray(energy), np.asarray(expected_energy), rtol=2e-4, atol=2e-4
    )


def test_fused_energy_conservation(hierarchical_target, rng_key):
    """Small steps: the endpoint energy stays near the initial energy."""
    kx, km = jax.random.split(rng_key)
    x0 = jax.random.normal(kx, (16, DIM), jnp.float32) * 0.3
    m0 = jax.random.normal(km, (16, DIM), jnp.float32)
    imm = jnp.ones(DIM, jnp.float32)
    _, _, energy = fused_leapfrog(
        x0, m0, imm, 0.01, target=hierarchical_target, num_steps=50,
        tile_chains=8, interpret=True,
    )
    energy0 = -hierarchical_target.logdensity_fn(x0) + 0.5 * jnp.sum(m0**2, axis=1)
    np.testing.assert_allclose(np.asarray(energy), np.asarray(energy0), atol=0.05)


def test_registry_and_validation(hierarchical_target):
    assert get_registered_target("hierarchical_gaussian", DIM) is hierarchical_target
    with pytest.raises(ValueError, match="No registered target"):
        get_registered_target("hierarchical_gaussian", DIM + 999)
    with pytest.raises(ValueError, match="dim"):
        fused_leapfrog(
            jnp.zeros((4, DIM + 1)), jnp.zeros((4, DIM + 1)), jnp.ones(DIM + 1),
            0.1, target=hierarchical_target, num_steps=2, interpret=True,
        )


def test_fused_hmc_moment_recovery(rng_key):
    """Fused HMC on an anisotropic Gaussian recovers its variances."""
    variances = jnp.asarray([0.5, 1.0, 2.0, 4.0] * 3, jnp.float32)
    target = make_gaussian_target(DIM, variances)
    algo = fused_hmc(
        target,
        step_size=0.35,
        inverse_mass_matrix=variances,
        num_integration_steps=8,
        tile_chains=8,
        interpret=True,
    )
    init_key, run_key = jax.random.split(rng_key)
    state = algo.init(jax.random.normal(init_key, (64, DIM)) * 2.0)

    def one(state, key):
        state, info = algo.step(key, state)
        return state, (state.positions, info.acceptance_rate)

    keys = jax.random.split(run_key, 300)
    state, (hist, acc) = jax.lax.scan(one, state, keys)
    assert 0.6 < float(jnp.mean(acc)) <= 1.0
    samples = np.asarray(hist[100:]).reshape(-1, DIM)
    np.testing.assert_allclose(samples.var(0), np.asarray(variances), rtol=0.25)
    np.testing.assert_allclose(samples.mean(0), 0.0, atol=0.2)


def test_logistic_regression_target_matches_xla(rng_key):
    """Matmul-class registered target: fused trajectories must match the
    XLA integrator on the same logdensity."""
    from blackjax_tpu.ops import make_logistic_regression_target

    n_data, dim = 40, 7
    kx, kw, kpos, km = jax.random.split(rng_key, 4)
    X = jax.random.normal(kx, (n_data, dim))
    w_true = jax.random.normal(kw, (dim,))
    y = (jax.random.uniform(kx, (n_data,)) < jax.nn.sigmoid(X @ w_true)).astype(
        jnp.float32
    )
    target = make_logistic_regression_target(np.asarray(X), np.asarray(y))

    # tile functions agree with autodiff of the plain logdensity
    w_batch = jax.random.normal(kpos, (4, dim), jnp.float32)
    ld_plain = jax.vmap(target.logdensity_fn)(w_batch)
    g_plain = jax.vmap(jax.grad(target.logdensity_fn))(w_batch)

    x0 = jnp.pad(w_batch, ((0, 4), (0, 128 - dim)))  # pad to (8, 128) tile
    lane = jnp.arange(128)[None, :]
    mask = (lane < dim).astype(jnp.float32)
    # pad the registered params exactly like fused_leapfrog does
    X_pad = jnp.pad(jnp.asarray(target.params[0]), ((0, 0), (0, 128 - dim)))
    y_pad = jnp.pad(jnp.asarray(target.params[1]), ((0, 7), (0, 0)))
    m_pad = jnp.pad(jnp.asarray(target.params[2]), ((0, 7), (0, 0)))
    ld_tile = target.logdensity_tile(x0, mask, X_pad, y_pad, m_pad)[:4]
    g_tile = target.grad_tile(x0, mask, X_pad, y_pad, m_pad)[:4, :dim]
    np.testing.assert_allclose(np.asarray(ld_tile), np.asarray(ld_plain), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g_tile), np.asarray(g_plain), rtol=1e-4, atol=1e-5)

    # full fused trajectory vs the XLA integrator
    x0 = jax.random.normal(kpos, (12, dim), jnp.float32) * 0.3
    m0 = jax.random.normal(km, (12, dim), jnp.float32)
    imm = jnp.ones(dim, jnp.float32)
    x_ref, m_ref, _ = _xla_trajectory(target.logdensity_fn, x0, m0, imm, 0.02, 6)
    x_f, m_f, energy = fused_leapfrog(
        x0, m0, imm, 0.02, target=target, num_steps=6, tile_chains=8, interpret=True
    )
    np.testing.assert_allclose(np.asarray(x_f), np.asarray(x_ref), rtol=3e-4, atol=3e-4)
    np.testing.assert_allclose(np.asarray(m_f), np.asarray(m_ref), rtol=3e-4, atol=3e-4)


def test_fused_hmc_logreg_posterior(rng_key):
    """Fused HMC on the matmul-class target recovers the logreg posterior
    (compared against long-run NUTS on the same logdensity)."""
    from blackjax_tpu.ops import make_logistic_regression_target

    n_data, dim = 200, 3
    kx, kw = jax.random.split(jax.random.key(11))
    X = np.asarray(jax.random.normal(kx, (n_data, dim)))
    w_true = np.asarray([1.0, -0.5, 0.25])
    y = np.asarray(
        (jax.random.uniform(kw, (n_data,)) < jax.nn.sigmoid(jnp.asarray(X) @ w_true))
    ).astype(np.float32)
    target = make_logistic_regression_target(X, y, prior_scale=5.0)

    algo = fused_hmc(
        target,
        step_size=0.08,
        inverse_mass_matrix=jnp.ones(dim),
        num_integration_steps=10,
        tile_chains=8,
        interpret=True,
    )
    init_key, run_key = jax.random.split(rng_key)
    state = algo.init(0.1 * jax.random.normal(init_key, (32, dim)))

    def one(state, key):
        state, info = algo.step(key, state)
        return state, state.positions

    _, hist = jax.lax.scan(one, state, jax.random.split(run_key, 250))
    fused_samples = np.asarray(hist[100:]).reshape(-1, dim)

    # reference posterior from NUTS on the same logdensity
    import blackjax_tpu

    nuts_algo = blackjax_tpu.nuts(
        target.logdensity_fn, step_size=0.1, inverse_mass_matrix=jnp.ones(dim)
    )
    _, (states, _) = blackjax_tpu.util.run_inference_algorithm(
        jax.random.fold_in(rng_key, 3),
        nuts_algo,
        1500,
        initial_position=jnp.zeros(dim),
    )
    nuts_samples = np.asarray(states.position[300:])

    np.testing.assert_allclose(
        fused_samples.mean(0), nuts_samples.mean(0), atol=0.08
    )
    np.testing.assert_allclose(
        fused_samples.std(0), nuts_samples.std(0), rtol=0.3
    )
