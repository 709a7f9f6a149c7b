"""Metropolis-adjusted MCLMC with per-transition random trajectory lengths.

A thin lift of the static adjusted-MCLMC kernel
(:mod:`blackjax_tpu.mcmc.adjusted_mclmc`) through
:func:`blackjax_tpu.mcmc.dynamic_hmc.lift_drawn_steps`: each transition
draws its integration-step count from the carried generator argument
(Halton index or PRNG key), runs the fixed-length adjusted kernel, and
advances the carry.  Jittered lengths decorrelate the periodic return of
the isokinetic flow the same way they do for HMC.

Behavioral parity: ``blackjax/mcmc/adjusted_mclmc_dynamic.py`` (kernel :55,
Halton lengths :197-215).
"""
from typing import Callable

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import integrators
from blackjax_tpu.mcmc.adjusted_mclmc import rescale
from blackjax_tpu.mcmc.adjusted_mclmc import build_kernel as build_static_kernel
from blackjax_tpu.mcmc.dynamic_hmc import (
    DynamicHMCState,
    _fresh_key,
    _uniform_steps,
    halton_sequence,
    lift_drawn_steps,
)
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey

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
    integration_steps_fn: Callable = _uniform_steps,
    integrator: Callable = integrators.isokinetic_mclachlan,
    divergence_threshold: float = 1000,
    next_random_arg_fn: Callable = _fresh_key,
    max_integration_steps: int = None,
):
    """Adjusted MCLMC whose step count is redrawn every transition.

    ``max_integration_steps`` (static upper bound on the drawn counts)
    switches the integration to a masked fixed-trip loop — for vmapped
    ensembles with per-chain drawn lengths this is ~an-order-of-magnitude
    faster than the traced-bound loop (measured 15x at 4096 chains on v5e)
    at the cost of every chain paying the max length."""
    static_kernel = build_static_kernel(
        integrator=integrator,
        divergence_threshold=divergence_threshold,
        max_integration_steps=max_integration_steps,
    )

    def kernel(
        rng_key: PRNGKey, state: DynamicHMCState, logdensity_fn: Callable,
        step_size: float, L_proposal_factor: float = jnp.inf,
        inverse_mass_matrix=1.0, integration_steps_params: tuple = (),
    ):
        stepped = lambda key, chain, n: static_kernel(
            key,
            chain,
            logdensity_fn,
            step_size,
            (n,),
            inverse_mass_matrix,
            L_proposal_factor,
        )
        lifted = lift_drawn_steps(stepped, integration_steps_fn, next_random_arg_fn)
        return lifted(rng_key, state, integration_steps_params)

    return kernel


def as_top_level_api(
    logdensity_fn: Callable, step_size: float,
    L_proposal_factor: float = jnp.inf, inverse_mass_matrix=1.0, *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.isokinetic_mclachlan,
    next_random_arg_fn: Callable = _fresh_key,
    integration_steps_fn: Callable = _uniform_steps,
    integration_steps_params: tuple = (),
    max_integration_steps: int = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.adjusted_mclmc_dynamic(...)``."""
    kernel = build_kernel(
        integration_steps_fn=integration_steps_fn, integrator=integrator,
        next_random_arg_fn=next_random_arg_fn,
        divergence_threshold=divergence_threshold,
        max_integration_steps=max_integration_steps,
    )
    return build_sampling_algorithm(
        kernel, init, logdensity_fn,
        kernel_args=(step_size, L_proposal_factor, inverse_mass_matrix,
                     integration_steps_params),
        pass_rng_key_to_init=True,
    )


def trajectory_length(t, mu):
    """Halton quasi-random trajectory length with mean ``mu``."""
    return jnp.rint(0.5 + halton_sequence(t) * rescale(mu))


def make_random_trajectory_length_fn(random_trajectory_length: bool) -> Callable:
    """``(random_generator_arg, avg_num_integration_steps) -> int``: a
    uniform-jittered step count with the requested mean, or the
    deterministic ceiling."""
    if random_trajectory_length:

        def integration_steps_fn(key, avg_num_integration_steps):
            jittered = jax.random.uniform(key) * rescale(avg_num_integration_steps)
            return jnp.clip(jnp.ceil(jittered), min=1).astype(jnp.int32)

    else:

        def integration_steps_fn(key, avg_num_integration_steps):
            n = jnp.clip(jnp.ceil(avg_num_integration_steps), min=1)
            return n.astype(jnp.int32)

    return integration_steps_fn
