"""Hamiltonian Monte Carlo with static trajectory length.

Behavioral parity target: ``blackjax/mcmc/hmc.py`` (reference; ``HMCState``
:38, endpoint proposal :115, multinomial proposal :181, kernel :251).
"""
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators, metrics, trajectory
from blackjax_tpu.mcmc.proposal import safe_energy_diff, static_binomial_sampling
from blackjax_tpu.mcmc.trajectory import hmc_energy
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "HMCState",
    "HMCInfo",
    "init",
    "build_kernel",
    "as_top_level_api",
    "hmc_proposal",
    "multinomial_hmc_proposal",
    "flip_momentum",
]


class HMCState(NamedTuple):
    """Chain state: position plus cached logdensity and gradient."""

    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


class HMCInfo(NamedTuple):
    """Per-transition diagnostics."""

    momentum: ArrayTree
    acceptance_rate: float
    is_accepted: bool
    is_divergent: bool
    energy: float
    proposal: integrators.IntegratorState
    num_integration_steps: int


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> HMCState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return HMCState(position, logdensity, logdensity_grad)


def flip_momentum(state: integrators.IntegratorState) -> integrators.IntegratorState:
    """Negate the endpoint momentum so the proposal map is an involution
    (required for detailed balance)."""
    return state._replace(momentum=jax.tree.map(jnp.negative, state.momentum))


def hmc_proposal(
    integrator: Callable,
    kinetic_energy: Callable,
    step_size: Union[float, ArrayLikeTree],
    num_integration_steps: int = 1,
    divergence_threshold: float = 1000,
    *,
    sample_proposal: Callable = static_binomial_sampling,
) -> Callable:
    """Endpoint HMC: integrate ``num_integration_steps`` forward, flip the
    momentum, Metropolis-accept the endpoint."""
    build_trajectory = trajectory.static_integration(integrator)
    energy_fn = hmc_energy(kinetic_energy)

    def generate(rng_key, state: integrators.IntegratorState):
        end_state = build_trajectory(state, step_size, num_integration_steps)
        end_state = flip_momentum(end_state)
        initial_energy = energy_fn(state)
        new_energy = energy_fn(end_state)
        delta_energy = safe_energy_diff(initial_energy, new_energy)
        is_diverging = -delta_energy > divergence_threshold
        sampled, (do_accept, p_accept, other_info) = sample_proposal(
            rng_key, delta_energy, state, end_state
        )
        info = HMCInfo(
            state.momentum,
            p_accept,
            do_accept,
            is_diverging,
            new_energy,
            end_state,
            num_integration_steps,
        )
        return sampled, info, other_info

    return generate


def multinomial_hmc_proposal(
    integrator: Callable,
    kinetic_energy: Callable,
    step_size: Union[float, ArrayLikeTree],
    num_integration_steps: int = 1,
    divergence_threshold: float = 1000,
) -> Callable:
    """Multinomial HMC: sample one state from the whole fixed-length
    trajectory proportional to ``exp(-H)`` (progressive reservoir sampling;
    no MH rejection, so ``is_accepted`` is always True)."""
    build_trajectory = trajectory.static_progressive_integration(
        integrator, kinetic_energy, num_integration_steps, divergence_threshold
    )

    def generate(rng_key, state: integrators.IntegratorState):
        proposal, is_diverging = build_trajectory(rng_key, state, step_size)
        # diagnostic: mean exponentiated energy difference over the trajectory
        acceptance_rate = jnp.exp(proposal.sum_log_p_accept) / num_integration_steps
        info = HMCInfo(
            momentum=state.momentum,
            acceptance_rate=acceptance_rate,
            is_accepted=jnp.asarray(True),
            is_divergent=is_diverging,
            energy=proposal.energy,
            proposal=proposal.state,
            num_integration_steps=num_integration_steps,
        )
        return proposal.state, info, None

    return generate


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    build_proposal: Callable = hmc_proposal,
):
    """General HMC kernel: parameters are passed per call so adaptation can
    re-tune them without retracing the Python closure."""

    def kernel(
        rng_key: PRNGKey,
        state: HMCState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        num_integration_steps: int,
    ) -> tuple[HMCState, HMCInfo]:
        metric = metrics.default_metric(inverse_mass_matrix)
        symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
        generate = build_proposal(
            symplectic_integrator,
            metric.kinetic_energy,
            step_size,
            num_integration_steps,
            divergence_threshold,
        )

        key_momentum, key_integrator = jax.random.split(rng_key)
        position, logdensity, logdensity_grad = state
        momentum = metric.sample_momentum(key_momentum, position)

        integrator_state = integrators.IntegratorState(
            position, momentum, logdensity, logdensity_grad
        )
        proposal, info, _ = generate(key_integrator, integrator_state)
        return (
            HMCState(proposal.position, proposal.logdensity, proposal.logdensity_grad),
            info,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: metrics.MetricTypes,
    num_integration_steps: int,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    build_proposal: Callable = hmc_proposal,
) -> SamplingAlgorithm:
    """``blackjax_tpu.hmc(...)``: specialize the general kernel over fixed
    parameters."""
    kernel = build_kernel(integrator, divergence_threshold, build_proposal)
    metric = metrics.default_metric(inverse_mass_matrix)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, metric, num_integration_steps),
    )
