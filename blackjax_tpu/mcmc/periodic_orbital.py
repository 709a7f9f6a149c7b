"""Periodic orbital MCMC (Neklyudov & Welling 2022, Algorithm 2): each
transition emits a whole weighted Hamiltonian orbit; the next transition
resamples a point from it by weight and rebuilds the orbit around it.

Behavioral parity target: ``blackjax/mcmc/periodic_orbital.py`` (state :28,
orbit proposal :280).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators, metrics
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["PeriodicOrbitalState", "init", "build_kernel", "as_top_level_api"]


class PeriodicOrbitalState(NamedTuple):
    """A weighted orbit: ``period`` positions, their importance weights,
    each point's index along the orbit, and cached logdensities/grads."""

    positions: ArrayTree
    weights: Array
    directions: Array
    logdensities: Array
    logdensities_grad: ArrayTree


class PeriodicOrbitalInfo(NamedTuple):
    momentums: ArrayTree
    weights_mean: float
    weights_variance: float


def init(position: ArrayLikeTree, logdensity_fn: Callable, period: int) -> PeriodicOrbitalState:
    """Degenerate initial orbit: the starting position repeated ``period``
    times with uniform weights."""
    positions = jax.tree.map(
        lambda p: jnp.repeat(jnp.asarray(p)[None], period, axis=0), position
    )
    logdensities, logdensities_grad = jax.vmap(jax.value_and_grad(logdensity_fn))(positions)
    return PeriodicOrbitalState(
        positions,
        jnp.full(period, 1.0 / period),
        jnp.arange(period),
        logdensities,
        logdensities_grad,
    )


def periodic_orbital_proposal(
    bijection: Callable, kinetic_energy_fn: Callable, period: int, step_size: float
) -> Callable:
    """Rebuild the orbit around a starting state: integrate backwards to
    index 0 and forwards to index period-1, weighting each point by
    ``exp(logdensity - kinetic_energy)``."""

    def generate(direction: int, init_state: integrators.IntegratorState):
        index_steps = jnp.arange(period) - direction

        def orbit_fn(state, i):
            state = jax.lax.cond(
                i != 0,
                lambda: bijection(state, jnp.sign(i) * step_size),
                lambda: init_state,
            )
            weight = state.logdensity - kinetic_energy_fn(state.momentum)
            return state, (state, jnp.exp(weight))

        _, (states, weights) = jax.lax.scan(orbit_fn, init_state, index_steps)
        directions = jnp.where(index_steps < 0, -(index_steps + 1), index_steps + direction)

        new_state = PeriodicOrbitalState(
            states.position,
            weights / jnp.sum(weights),
            directions,
            states.logdensity,
            states.logdensity_grad,
        )
        info = PeriodicOrbitalInfo(states.momentum, jnp.mean(weights), jnp.var(weights))
        return new_state, info

    return generate


def build_kernel(bijection: Callable = integrators.velocity_verlet):
    """Periodic orbital kernel: weight-sample a point from the current
    orbit, shift its direction by half a period (irreversibility), draw a
    fresh momentum, and rebuild."""

    def kernel(
        rng_key: PRNGKey,
        state: PeriodicOrbitalState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: Array,
        period: int,
    ) -> tuple[PeriodicOrbitalState, PeriodicOrbitalInfo]:
        metric = metrics.gaussian_euclidean(inverse_mass_matrix)
        bijection_fn = bijection(logdensity_fn, metric.kinetic_energy)
        generate = periodic_orbital_proposal(
            bijection_fn, metric.kinetic_energy, period, step_size
        )

        key_choice, key_momentum = jax.random.split(rng_key)
        idx = jax.random.choice(key_choice, state.weights.shape[0], p=state.weights)
        position = jax.tree.map(lambda p: p[idx], state.positions)
        orbit_period = jnp.max(state.directions) + 1
        direction = jnp.mod(
            state.directions[idx] + jnp.asarray(orbit_period / 2, int), orbit_period
        )
        momentum = metric.sample_momentum(key_momentum, position)
        start = integrators.IntegratorState(
            position,
            momentum,
            state.logdensities[idx],
            jax.tree.map(lambda g: g[idx], state.logdensities_grad),
        )
        return generate(direction, start)

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: Array,
    period: int,
    *,
    bijection: Callable = integrators.velocity_verlet,
) -> SamplingAlgorithm:
    """``blackjax_tpu.orbital_hmc(...)``."""
    kernel = build_kernel(bijection)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        init_args=(period,),
        kernel_args=(step_size, inverse_mass_matrix, period),
    )
