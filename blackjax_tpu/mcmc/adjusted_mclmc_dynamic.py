"""Metropolis-adjusted MCLMC with random (Halton-jittered) trajectory
lengths.

Behavioral parity target: ``blackjax/mcmc/adjusted_mclmc_dynamic.py``
(kernel :55, Halton trajectory lengths :197-215).
"""
from typing import Callable

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators
from blackjax_tpu.mcmc.adjusted_mclmc import adjusted_mclmc_proposal, rescale
from blackjax_tpu.mcmc.dynamic_hmc import DynamicHMCState, halton_sequence
from blackjax_tpu.mcmc.hmc import HMCInfo
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey
from blackjax_tpu.util import generate_unit_vector

__all__ = [
    "init",
    "build_kernel",
    "as_top_level_api",
    "trajectory_length",
    "make_random_trajectory_length_fn",
]


def init(
    position: ArrayLikeTree, logdensity_fn: Callable, random_generator_arg: Array
) -> DynamicHMCState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return DynamicHMCState(position, logdensity, logdensity_grad, random_generator_arg)


def build_kernel(
    integration_steps_fn: Callable = lambda key: jax.random.randint(key, (), 1, 10),
    integrator: Callable = integrators.isokinetic_mclachlan,
    divergence_threshold: float = 1000,
    next_random_arg_fn: Callable = lambda key: jax.random.split(key)[1],
):
    """Adjusted MCLMC with a per-transition step count drawn from
    ``integration_steps_fn(random_generator_arg, *params)``."""

    def kernel(
        rng_key: PRNGKey,
        state: DynamicHMCState,
        logdensity_fn: Callable,
        step_size: float,
        L_proposal_factor: float = jnp.inf,
        inverse_mass_matrix=1.0,
        integration_steps_params: tuple = (),
    ) -> tuple[DynamicHMCState, HMCInfo]:
        num_integration_steps = integration_steps_fn(
            state.random_generator_arg, *integration_steps_params
        )
        key_momentum, key_integrator = jax.random.split(rng_key)
        momentum = generate_unit_vector(key_momentum, state.position)
        generate = adjusted_mclmc_proposal(
            integrators.with_isokinetic_maruyama(
                integrator(logdensity_fn, inverse_mass_matrix)
            ),
            step_size,
            L_proposal_factor * (num_integration_steps * step_size),
            num_integration_steps,
            divergence_threshold,
        )
        proposal, info, _ = generate(
            key_integrator,
            integrators.IntegratorState(
                state.position, momentum, state.logdensity, state.logdensity_grad
            ),
        )
        return (
            DynamicHMCState(
                proposal.position,
                proposal.logdensity,
                proposal.logdensity_grad,
                next_random_arg_fn(state.random_generator_arg),
            ),
            info,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    L_proposal_factor: float = jnp.inf,
    inverse_mass_matrix=1.0,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.isokinetic_mclachlan,
    next_random_arg_fn: Callable = lambda key: jax.random.split(key)[1],
    integration_steps_fn: Callable = lambda key: jax.random.randint(key, (), 1, 10),
    integration_steps_params: tuple = (),
) -> SamplingAlgorithm:
    """``blackjax_tpu.adjusted_mclmc_dynamic(...)``."""
    kernel = build_kernel(
        integration_steps_fn=integration_steps_fn,
        integrator=integrator,
        next_random_arg_fn=next_random_arg_fn,
        divergence_threshold=divergence_threshold,
    )
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(
            step_size,
            L_proposal_factor,
            inverse_mass_matrix,
            integration_steps_params,
        ),
        pass_rng_key_to_init=True,
    )


def trajectory_length(t, mu):
    """Halton-sequence quasi-random trajectory length with mean ``mu``."""
    return jnp.rint(0.5 + halton_sequence(t) * rescale(mu))


def make_random_trajectory_length_fn(random_trajectory_length: bool) -> Callable:
    """``(random_generator_arg, avg_num_integration_steps) -> int``: a
    uniform-jittered step count with the requested mean, or the
    deterministic ceiling."""
    if random_trajectory_length:

        def integration_steps_fn(key, avg_num_integration_steps):
            return jnp.clip(
                jnp.ceil(jax.random.uniform(key) * rescale(avg_num_integration_steps)),
                min=1,
            ).astype(jnp.int32)

    else:

        def integration_steps_fn(key, avg_num_integration_steps):
            return jnp.clip(jnp.ceil(avg_num_integration_steps), min=1).astype(jnp.int32)

    return integration_steps_fn
