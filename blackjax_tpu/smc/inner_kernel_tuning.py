"""Inner-kernel tuning for SMC: re-tune the mutation kernel's parameters
from the particle cloud between SMC steps.

Behavioral parity target: ``blackjax/smc/inner_kernel_tuning.py`` (state
:23, kernel :54).
"""
from typing import Callable, NamedTuple

import jax

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.smc.base import SMCInfo, SMCState
from blackjax_tpu.types import ArrayTree, PRNGKey

__all__ = ["StateWithParameterOverride", "init", "build_kernel", "as_top_level_api"]


class StateWithParameterOverride(NamedTuple):
    """Inner SMC state plus the per-parameter override dict (values have a
    leading particle axis; length-1 means shared)."""

    sampler_state: ArrayTree
    parameter_override: dict


def init(alg_init_fn, position, initial_parameter_value):
    return StateWithParameterOverride(alg_init_fn(position), initial_parameter_value)


def build_kernel(
    smc_algorithm,
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    resampling_fn: Callable,
    mcmc_parameter_update_fn: Callable,
    num_mcmc_steps: int = 10,
    smc_returns_state_with_parameter_override: bool = False,
    **extra_parameters,
) -> Callable:
    """Each step: run the wrapped SMC algorithm with the current parameter
    override, then recompute the override from the new particles/info via
    ``mcmc_parameter_update_fn(key, state, info)``. Set
    ``smc_returns_state_with_parameter_override`` to compose with pretuning."""
    if smc_returns_state_with_parameter_override:

        def unwrap(state):
            return state

        def rewrap(new_state, override):
            return StateWithParameterOverride(
                new_state.sampler_state, new_state.parameter_override | override
            )

    else:

        def unwrap(state):
            return state.sampler_state

        def rewrap(new_state, override):
            return StateWithParameterOverride(new_state, override)

    def kernel(
        rng_key: PRNGKey, state: StateWithParameterOverride, **extra_step_parameters
    ) -> tuple[StateWithParameterOverride, SMCInfo]:
        step_fn = smc_algorithm(
            logprior_fn=logprior_fn,
            loglikelihood_fn=loglikelihood_fn,
            mcmc_step_fn=mcmc_step_fn,
            mcmc_init_fn=mcmc_init_fn,
            mcmc_parameters=state.parameter_override,
            resampling_fn=resampling_fn,
            num_mcmc_steps=num_mcmc_steps,
            **extra_parameters,
        ).step
        update_key, step_key = jax.random.split(rng_key)
        new_state, info = step_fn(step_key, unwrap(state), **extra_step_parameters)
        override = mcmc_parameter_update_fn(update_key, new_state, info)
        return rewrap(new_state, override), info

    return kernel


def as_top_level_api(
    smc_algorithm,
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    resampling_fn: Callable,
    mcmc_parameter_update_fn: Callable,
    initial_parameter_value,
    num_mcmc_steps: int = 10,
    smc_returns_state_with_parameter_override: bool = False,
    **extra_parameters,
) -> SamplingAlgorithm:
    """``blackjax_tpu.inner_kernel_tuning(...)``."""
    kernel = build_kernel(
        smc_algorithm,
        logprior_fn,
        loglikelihood_fn,
        mcmc_step_fn,
        mcmc_init_fn,
        resampling_fn,
        mcmc_parameter_update_fn,
        num_mcmc_steps,
        smc_returns_state_with_parameter_override,
        **extra_parameters,
    )

    def init_fn(position, rng_key=None):
        del rng_key
        smc_init = smc_algorithm(
            logprior_fn=logprior_fn,
            loglikelihood_fn=loglikelihood_fn,
            mcmc_step_fn=mcmc_step_fn,
            mcmc_init_fn=mcmc_init_fn,
            mcmc_parameters=initial_parameter_value,
            resampling_fn=resampling_fn,
            num_mcmc_steps=num_mcmc_steps,
            **extra_parameters,
        ).init
        return init(smc_init, position, initial_parameter_value)

    def step_fn(rng_key: PRNGKey, state, **extra_step_parameters):
        return kernel(rng_key, state, **extra_step_parameters)

    return SamplingAlgorithm(init_fn, step_fn)
