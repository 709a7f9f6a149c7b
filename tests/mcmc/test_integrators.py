"""Integrator mechanics: energy conservation, reversibility, order."""
import jax
import jax.numpy as jnp
import pytest

from blackjax_tpu.mcmc import integrators, metrics


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / jnp.array([1.0, 4.0, 0.25]))


@pytest.mark.parametrize(
    "integrator_factory",
    [
        integrators.velocity_verlet,
        integrators.mclachlan,
        integrators.yoshida,
        integrators.omelyan,
    ],
)
def test_energy_conservation_and_reversibility(integrator_factory, rng_key):
    metric = metrics.gaussian_euclidean(jnp.ones(3))
    step = integrator_factory(logdensity, metric.kinetic_energy)
    position = jnp.array([1.0, -0.5, 0.3])
    momentum = metric.sample_momentum(rng_key, position)
    state = integrators.new_integrator_state(logdensity, position, momentum)

    energy0 = -state.logdensity + metric.kinetic_energy(state.momentum)
    out = state
    for _ in range(25):
        out = step(out, 0.05)
    energy1 = -out.logdensity + metric.kinetic_energy(out.momentum)
    assert abs(energy1 - energy0) < 1e-2

    # integrate back with flipped momentum: must return to the start
    back = out._replace(momentum=jax.tree.map(jnp.negative, out.momentum))
    for _ in range(25):
        back = step(back, 0.05)
    assert jnp.allclose(back.position, position, atol=1e-8)


def test_higher_order_integrators_are_more_accurate(rng_key):
    metric = metrics.gaussian_euclidean(jnp.ones(3))
    position = jnp.array([1.0, -0.5, 0.3])
    momentum = metric.sample_momentum(rng_key, position)

    errors = {}
    for name, factory in [
        ("verlet", integrators.velocity_verlet),
        ("mclachlan", integrators.mclachlan),
        ("yoshida", integrators.yoshida),
    ]:
        step = factory(logdensity, metric.kinetic_energy)
        state = integrators.new_integrator_state(logdensity, position, momentum)
        e0 = -state.logdensity + metric.kinetic_energy(state.momentum)
        for _ in range(10):
            state = step(state, 0.25)
        e1 = -state.logdensity + metric.kinetic_energy(state.momentum)
        errors[name] = abs(e1 - e0)
    assert errors["mclachlan"] < errors["verlet"]


def test_isokinetic_integrator_runs(rng_key):
    step = integrators.isokinetic_mclachlan(logdensity)
    position = jnp.array([1.0, -0.5, 0.3])
    momentum = jnp.array([0.6, 0.64, 0.48])  # unit norm
    state = integrators.new_integrator_state(logdensity, position, momentum)
    new_state, kinetic_change = step(state, 0.1)
    assert jnp.isfinite(kinetic_change)
    # isokinetic dynamics keeps the momentum on the unit sphere
    assert jnp.allclose(jnp.linalg.norm(new_state.momentum), 1.0, atol=1e-10)


def test_implicit_midpoint_matches_verlet_on_euclidean(rng_key):
    metric = metrics.gaussian_euclidean(jnp.ones(3))
    imp = integrators.implicit_midpoint(logdensity, metric.kinetic_energy)
    position = jnp.array([1.0, -0.5, 0.3])
    momentum = metric.sample_momentum(rng_key, position)
    state = integrators.new_integrator_state(logdensity, position, momentum)
    out = imp(state, 0.01)
    # implicit midpoint on a separable Hamiltonian stays close to the flow
    e0 = -state.logdensity + metric.kinetic_energy(state.momentum)
    e1 = -out.logdensity + metric.kinetic_energy(out.momentum)
    assert abs(e1 - e0) < 1e-4


def test_partial_refresh_infinite_L_is_identity(rng_key):
    momentum = jnp.array([0.6, 0.64, 0.48])
    out = integrators.partially_refresh_momentum(momentum, rng_key, 0.1, jnp.inf)
    assert jnp.allclose(out, momentum)
