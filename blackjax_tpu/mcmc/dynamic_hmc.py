"""HMC with a per-transition random number of integration steps.

Behavioral parity target: ``blackjax/mcmc/dynamic_hmc.py`` (state with a
random-generator carry :39, Halton quasi-random jitter :205 used by ChEES).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators
from blackjax_tpu.mcmc.hmc import HMCInfo, HMCState, hmc_proposal
from blackjax_tpu.mcmc.hmc import build_kernel as build_static_hmc_kernel
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "DynamicHMCState",
    "init",
    "build_kernel",
    "as_top_level_api",
    "halton_sequence",
    "halton_trajectory_length",
    "rescale",
]


class DynamicHMCState(NamedTuple):
    """HMC state plus the carry used to generate the (quasi-)random
    per-transition trajectory length."""

    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree
    random_generator_arg: Array


def init(position: ArrayLikeTree, logdensity_fn: Callable, random_generator_arg: Array):
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return DynamicHMCState(position, logdensity, logdensity_grad, random_generator_arg)


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    next_random_arg_fn: Callable = lambda key: jax.random.split(key)[1],
    integration_steps_fn: Callable = lambda key: jax.random.randint(key, (), 1, 10),
    build_proposal: Callable = hmc_proposal,
):
    """Dynamic-trajectory-length HMC. ``integration_steps_fn`` receives the
    carried ``random_generator_arg`` (a key, a Halton index, ...) plus
    optional tunable ``integration_steps_params`` and returns the step count
    for this transition."""
    hmc_base = build_static_hmc_kernel(integrator, divergence_threshold, build_proposal)

    def kernel(
        rng_key: PRNGKey,
        state: DynamicHMCState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: Array,
        integration_steps_params: tuple = (),
    ) -> tuple[DynamicHMCState, HMCInfo]:
        num_integration_steps = integration_steps_fn(
            state.random_generator_arg, *integration_steps_params
        )
        hmc_state = HMCState(state.position, state.logdensity, state.logdensity_grad)
        new_state, info = hmc_base(
            rng_key,
            hmc_state,
            logdensity_fn,
            step_size,
            inverse_mass_matrix,
            num_integration_steps,
        )
        return (
            DynamicHMCState(
                new_state.position,
                new_state.logdensity,
                new_state.logdensity_grad,
                next_random_arg_fn(state.random_generator_arg),
            ),
            info,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: Array,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    next_random_arg_fn: Callable = lambda key: jax.random.split(key)[1],
    integration_steps_fn: Callable = lambda key: jax.random.randint(key, (), 1, 10),
    integration_steps_params: tuple = (),
    build_proposal: Callable = hmc_proposal,
) -> SamplingAlgorithm:
    """``blackjax_tpu.dynamic_hmc(...)``."""
    kernel = build_kernel(
        integrator,
        divergence_threshold,
        next_random_arg_fn,
        integration_steps_fn,
        build_proposal,
    )
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, inverse_mass_matrix, integration_steps_params),
        pass_rng_key_to_init=True,
    )


def halton_sequence(i: Array, max_bits: int = 10) -> float:
    """The (i+1)-th element of the base-2 van der Corput / Halton sequence,
    computed by bit reversal — low-discrepancy trajectory-length jitter for
    ChEES-style adaptation."""
    if max_bits >= jnp.iinfo(i.dtype).bits:
        raise ValueError(
            f"max_bits ({max_bits}) must be smaller than the bit width of "
            f"{i.dtype} ({jnp.iinfo(i.dtype).bits})"
        )
    powers = 2 ** jnp.arange(max_bits, dtype=i.dtype)
    bits = jnp.mod((i + 1) // powers, 2)
    return jnp.sum(bits * 0.5 / powers)


def rescale(mu):
    """Scale ``s`` such that ``round(U(0,1) * s + 0.5)`` has mean ``mu``
    (used to convert an average trajectory length into a jitter range)."""
    k = jnp.floor(2 * mu - 1)
    x = k * (mu - 0.5 * (k + 1)) / (k + 1 - mu)
    return k + x


def halton_trajectory_length(
    i: Array, trajectory_length_adjustment: float, max_bits: int = 10
) -> int:
    """Quasi-random integer trajectory length with the requested mean."""
    s = rescale(trajectory_length_adjustment)
    return jnp.asarray(jnp.rint(0.5 + halton_sequence(i, max_bits) * s), dtype=int)
