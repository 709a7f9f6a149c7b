"""Adaptive Persistent Sampling: the next tempering parameter is chosen so
the PERSISTENT-ensemble ESS hits a target (which may exceed 1).

Behavioral parity target: ``blackjax/smc/adaptive_persistent_sampling.py``
(:27).
"""
from typing import Callable, Union

import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.smc import persistent_sampling, solver
from blackjax_tpu.smc.base import update_and_take_last
from blackjax_tpu.types import Array, PRNGKey

__all__ = ["init", "build_kernel", "as_top_level_api"]

init = persistent_sampling.init


def build_kernel(
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    resampling_fn: Callable,
    target_ess: Union[float, Array],
    update_strategy: Callable = update_and_take_last,
    root_solver: Callable = solver.dichotomy,
    batch_size: int = 0,
) -> Callable:
    ps_kernel = persistent_sampling.build_kernel(
        logprior_fn=logprior_fn,
        loglikelihood_fn=loglikelihood_fn,
        mcmc_step_fn=mcmc_step_fn,
        mcmc_init_fn=mcmc_init_fn,
        resampling_fn=resampling_fn,
        update_strategy=update_strategy,
        batch_size=batch_size,
    )

    def calculate_lambda(state: persistent_sampling.PersistentSMCState) -> Array:
        n_particles = state.num_particles
        target_val = jnp.log(n_particles * target_ess)
        max_delta = 1.0 - state.tempering_schedule[state.iteration]

        def objective(delta):
            log_weights, _ = persistent_sampling.compute_log_persistent_weights(
                state.persistent_log_likelihoods,
                state.persistent_log_Z,
                state.tempering_schedule.at[state.iteration + 1].set(
                    state.tempering_schedule[state.iteration] + delta
                ),
                state.iteration + 1,
                normalize_to_one=True,
            )
            ess_val = jnp.log(
                persistent_sampling.compute_persistent_ess(log_weights)
            )
            return ess_val - target_val

        # unsolvable -> delta 0: add a plain persistent iteration and retry
        delta = jnp.nan_to_num(root_solver(objective, 0.0, max_delta))
        return state.tempering_schedule[state.iteration] + jnp.clip(delta, 0.0, max_delta)

    def kernel(rng_key: PRNGKey, state, num_mcmc_steps, mcmc_parameters: dict):
        lmbda = calculate_lambda(state)
        return ps_kernel(rng_key, state, num_mcmc_steps, lmbda, mcmc_parameters)

    return kernel


def as_top_level_api(
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    n_schedule,
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    mcmc_parameters: dict,
    resampling_fn: Callable,
    target_ess: float,
    num_mcmc_steps: int = 10,
    update_strategy: Callable = update_and_take_last,
    root_solver: Callable = solver.dichotomy,
    batch_size: int = 0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.adaptive_persistent_sampling_smc(...)``."""
    kernel = build_kernel(
        logprior_fn,
        loglikelihood_fn,
        mcmc_step_fn,
        mcmc_init_fn,
        resampling_fn,
        target_ess,
        update_strategy,
        root_solver,
        batch_size,
    )

    def init_fn(position, rng_key=None):
        del rng_key
        return init(position, loglikelihood_fn, n_schedule, batch_size)

    def step_fn(rng_key: PRNGKey, state):
        return kernel(rng_key, state, num_mcmc_steps, mcmc_parameters)

    return SamplingAlgorithm(init_fn, step_fn)
