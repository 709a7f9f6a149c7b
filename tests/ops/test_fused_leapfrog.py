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
