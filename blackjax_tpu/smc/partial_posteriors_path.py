"""Data-tempered SMC: anneal by growing the set of observations entering
the likelihood (partial posteriors path).

Behavioral parity target: ``blackjax/smc/partial_posteriors_path.py``
(masked state :12-27, kernel :39).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.smc import base as smc_base
from blackjax_tpu.smc.base import update_and_take_last
from blackjax_tpu.smc.from_mcmc import build_kernel as smc_from_mcmc
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["PartialPosteriorsSMCState", "init", "build_kernel", "as_top_level_api"]


class PartialPosteriorsSMCState(NamedTuple):
    """Particles, weights and a boolean observation mask marking which
    datapoints currently enter the likelihood."""

    particles: ArrayTree
    weights: Array
    data_mask: Array


def init(particles: ArrayLikeTree, num_datapoints: int) -> PartialPosteriorsSMCState:
    n = jax.tree.leaves(particles)[0].shape[0]
    return PartialPosteriorsSMCState(
        particles, jnp.full(n, 1.0 / n), jnp.zeros(num_datapoints)
    )


def build_kernel(
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    resampling_fn: Callable,
    num_mcmc_steps: Optional[int],
    mcmc_parameters: ArrayTree,
    partial_logposterior_factory: Callable,
    update_strategy=update_and_take_last,
    batch_size: int = 0,
) -> Callable:
    """Each step moves from the posterior under ``state.data_mask`` to the
    one under the supplied ``data_mask``; incremental weights are the
    log-posterior ratio."""
    delegate = smc_from_mcmc(
        mcmc_step_fn, mcmc_init_fn, resampling_fn, update_strategy, batch_size
    )

    def step(key, state: PartialPosteriorsSMCState, data_mask: Array):
        logposterior_fn = partial_logposterior_factory(data_mask)
        previous_logposterior_fn = partial_logposterior_factory(state.data_mask)

        def log_weights_fn(x):
            return logposterior_fn(x) - previous_logposterior_fn(x)

        new_state, info = delegate(
            key, state, num_mcmc_steps, mcmc_parameters, logposterior_fn, log_weights_fn
        )
        return (
            PartialPosteriorsSMCState(new_state.particles, new_state.weights, data_mask),
            info,
        )

    return step


def as_top_level_api(
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    mcmc_parameters: dict,
    resampling_fn: Callable,
    num_mcmc_steps,
    partial_logposterior_factory: Callable,
    update_strategy=update_and_take_last,
    batch_size: int = 0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.partial_posteriors_smc(...)``."""
    kernel = build_kernel(
        mcmc_step_fn,
        mcmc_init_fn,
        resampling_fn,
        num_mcmc_steps,
        mcmc_parameters,
        partial_logposterior_factory,
        update_strategy,
        batch_size,
    )

    def init_fn(position: ArrayLikeTree, num_observations, rng_key=None):
        del rng_key
        return init(position, num_observations)

    def step_fn(key: PRNGKey, state: PartialPosteriorsSMCState, data_mask: Array):
        return kernel(key, state, data_mask)

    return SamplingAlgorithm(init_fn, step_fn)
