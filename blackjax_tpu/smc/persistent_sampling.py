"""Persistent Sampling (Karamanis et al. 2025): tempered SMC that keeps ALL
past particles, resampling each iteration from the whole zero-padded history
with mixture-importance weights.

Behavioral parity target: ``blackjax/smc/persistent_sampling.py`` (state
:43, weights over history :258 [eqs. 14-15], logZ :228 [eq. 16], resampling
:361, step :445, kernel :556).
"""
from functools import partial
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.smc.base import map_fn, update_and_take_last
from blackjax_tpu.smc.from_mcmc import unshared_parameters_and_step_fn
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "PersistentSMCState",
    "PersistentStateInfo",
    "init",
    "remove_padding",
    "compute_log_Z",
    "compute_log_persistent_weights",
    "resample_from_persistent",
    "compute_persistent_ess",
    "step",
    "build_kernel",
    "as_top_level_api",
]


class PersistentSMCState(NamedTuple):
    """Full particle history, zero-padded to ``n_schedule + 1`` iterations
    so the state has a static shape under jit."""

    persistent_particles: ArrayLikeTree  # leaves (n_schedule+1, N, ...)
    persistent_log_likelihoods: Array  # (n_schedule+1, N)
    persistent_log_Z: Array  # (n_schedule+1,)
    tempering_schedule: Array  # (n_schedule+1,)
    iteration: Union[int, Array]

    @property
    def particles(self) -> ArrayTree:
        return jax.tree.map(lambda x: x[self.iteration], self.persistent_particles)

    @property
    def tempering_param(self):
        return self.tempering_schedule[self.iteration]

    @property
    def log_Z(self):
        return self.persistent_log_Z[self.iteration]

    @property
    def persistent_weights(self) -> Array:
        return jnp.exp(
            compute_log_persistent_weights(
                self.persistent_log_likelihoods,
                self.persistent_log_Z,
                self.tempering_schedule,
                self.iteration,
                include_current=True,
            )[0]
        )

    @property
    def num_particles(self) -> int:
        return self.persistent_log_likelihoods.shape[1]


class PersistentStateInfo(NamedTuple):
    ancestors: Array
    update_info: NamedTuple


def init(
    particles: ArrayLikeTree,
    loglikelihood_fn: Callable,
    n_schedule: Union[int, Array],
    batch_size: int = 0,
) -> PersistentSMCState:
    """Allocate the padded history and write iteration 0 (prior draws)."""
    num_particles = jax.tree.leaves(particles)[0].shape[0]
    logliks = map_fn(loglikelihood_fn, batch_size)(particles)
    padded_logliks = jnp.zeros((n_schedule + 1, num_particles)).at[0].set(logliks)
    padded_particles = jax.tree.map(
        lambda x: jnp.zeros((n_schedule + 1, *x.shape)).at[0].set(x), particles
    )
    return PersistentSMCState(
        padded_particles,
        padded_logliks,
        jnp.zeros(n_schedule + 1),
        jnp.zeros(n_schedule + 1),
        jnp.array(0),
    )


def remove_padding(state: PersistentSMCState) -> PersistentSMCState:
    """Host-side: trim the padded arrays to the current iteration."""
    it = state.iteration
    return PersistentSMCState(
        jax.tree.map(lambda x: x[: it + 1], state.persistent_particles),
        state.persistent_log_likelihoods[: it + 1],
        state.persistent_log_Z[: it + 1],
        state.tempering_schedule[: it + 1],
        state.iteration,
    )


def compute_log_Z(log_weights: Array, iteration) -> Array:
    """Normalizing-constant estimate (eq. 16): ``mean of weights over
    iteration * N`` slots."""
    num_particles = log_weights.shape[1]
    return logsumexp(log_weights) - jnp.log(num_particles) - jnp.log(iteration)


def compute_log_persistent_weights(
    persistent_log_likelihoods: Array,
    persistent_log_Z: Array,
    tempering_schedule: Array,
    iteration,
    include_current: bool = False,
    normalize_to_one: bool = False,
):
    """Mixture importance weights of every historical particle against the
    current tempered target (eqs. 14-15): numerator ``L^lambda_t``,
    denominator the mixture of all past tempered distributions. Masked rows
    (beyond the current iteration) get weight zero. Weights sum to
    ``iteration * N`` unless ``normalize_to_one``."""
    current_iteration = iteration + 1 if include_current else iteration
    mask = jnp.arange(persistent_log_likelihoods.shape[0])[:, None] < current_iteration

    log_numerator = jnp.where(
        mask, persistent_log_likelihoods * tempering_schedule[iteration], jnp.nan
    )
    # mixture denominator: loop keeps memory at O(history * N) instead of
    # materializing the (history, history, N) broadcast
    log_denominator = jax.lax.fori_loop(
        0,
        current_iteration,
        lambda i, val: jnp.where(
            mask,
            jnp.logaddexp(
                val,
                tempering_schedule[i] * persistent_log_likelihoods - persistent_log_Z[i],
            ),
            jnp.nan,
        ),
        jnp.full_like(persistent_log_likelihoods, -jnp.inf),
    ) + jnp.log(1.0 / current_iteration)

    unnormalized = jnp.nan_to_num(log_numerator - log_denominator, nan=-jnp.inf)
    log_Z = compute_log_Z(unnormalized, current_iteration)
    log_weights = unnormalized - log_Z
    if normalize_to_one:
        log_weights = log_weights - jnp.log(current_iteration * log_weights.shape[1])
    return log_weights, log_Z


def resample_from_persistent(
    rng_key: PRNGKey,
    persistent_particles: ArrayLikeTree,
    persistent_weights: Array,
    resample_fn: Callable,
):
    """Draw N particles from the flattened ``history x N`` ensemble."""
    idx = resample_fn(
        rng_key, persistent_weights.flatten(), persistent_weights.shape[1]
    )
    particles = jax.tree.map(
        lambda x: x.reshape(-1, *x.shape[2:])[idx], persistent_particles
    )
    return particles, idx


def compute_persistent_ess(log_persistent_weights: Array, normalize_weights: bool = False):
    """Kish ESS over the persistent ensemble (eq. 17; can exceed 1)."""
    if normalize_weights:
        log_persistent_weights = log_persistent_weights - logsumexp(log_persistent_weights)
    return 1.0 / jnp.sum(jnp.exp(log_persistent_weights) ** 2)


def step(
    rng_key: PRNGKey,
    state: PersistentSMCState,
    lmbda,
    loglikelihood_fn: Callable,
    update_fn: Callable,
    resample_fn: Callable,
    weight_fn: Callable = compute_log_persistent_weights,
    batch_size: int = 0,
) -> tuple[PersistentSMCState, PersistentStateInfo]:
    """One persistent-sampling move to tempering parameter ``lmbda``
    (Karamanis et al. Algorithm 2)."""
    iteration = state.iteration + 1
    updating_key, resampling_key = jax.random.split(rng_key)

    tempering_schedule = state.tempering_schedule.at[iteration].set(lmbda)
    log_weights, log_Z = weight_fn(
        state.persistent_log_likelihoods,
        state.persistent_log_Z,
        tempering_schedule,
        iteration,
        normalize_to_one=True,
    )

    num_particles = state.num_particles
    iteration_particles, ancestors = resample_from_persistent(
        resampling_key, state.persistent_particles, jnp.exp(log_weights), resample_fn
    )
    keys = jax.random.split(updating_key, num_particles)
    iteration_particles, update_info = update_fn(keys, iteration_particles)
    iteration_logliks = map_fn(loglikelihood_fn, batch_size)(iteration_particles)

    new_state = PersistentSMCState(
        jax.tree.map(
            lambda hist, cur: hist.at[iteration].set(cur),
            state.persistent_particles,
            iteration_particles,
        ),
        state.persistent_log_likelihoods.at[iteration].set(iteration_logliks),
        state.persistent_log_Z.at[iteration].set(log_Z),
        tempering_schedule,
        iteration,
    )
    return new_state, PersistentStateInfo(ancestors, update_info)


def build_kernel(
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    resampling_fn: Callable,
    update_strategy: Callable = update_and_take_last,
    batch_size: int = 0,
) -> Callable:
    """Persistent-sampling kernel with a fixed tempering schedule. The
    prior must be normalized (Z_0 = 1) for the weighting scheme."""

    def update_fn(
        rng_key, current_particles, num_mcmc_steps, logposterior_fn, mcmc_parameters, n_particles
    ):
        unshared, shared_step_fn = unshared_parameters_and_step_fn(
            mcmc_parameters, mcmc_step_fn
        )
        mcmc_kernel, _ = update_strategy(
            mcmc_init_fn,
            logposterior_fn,
            shared_step_fn,
            num_mcmc_steps=num_mcmc_steps,
            n_particles=n_particles,
            **({"batch_size": batch_size} if batch_size else {}),
        )
        return mcmc_kernel(rng_key, current_particles, unshared)

    def kernel(
        rng_key: PRNGKey,
        state: PersistentSMCState,
        num_mcmc_steps,
        lmbda,
        mcmc_parameters: dict,
    ) -> tuple[PersistentSMCState, PersistentStateInfo]:
        def logposterior_fn(x):
            return logprior_fn(x) + lmbda * loglikelihood_fn(x)

        bound_update = partial(
            update_fn,
            num_mcmc_steps=num_mcmc_steps,
            logposterior_fn=logposterior_fn,
            mcmc_parameters=mcmc_parameters,
            n_particles=state.num_particles,
        )
        return step(
            rng_key,
            state,
            lmbda,
            loglikelihood_fn,
            bound_update,
            resampling_fn,
            batch_size=batch_size,
        )

    return kernel


def as_top_level_api(
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    n_schedule,
    mcmc_step_fn: Callable,
    mcmc_init_fn: Callable,
    mcmc_parameters: dict,
    resampling_fn: Callable,
    num_mcmc_steps: int = 10,
    update_strategy: Callable = update_and_take_last,
    batch_size: int = 0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.persistent_sampling_smc(...)``. ``n_schedule`` must
    match the schedule length actually used (the history is preallocated to
    ``n_schedule + 1`` for jit)."""
    kernel = build_kernel(
        logprior_fn,
        loglikelihood_fn,
        mcmc_step_fn,
        mcmc_init_fn,
        resampling_fn,
        update_strategy,
        batch_size,
    )

    def init_fn(position, rng_key=None):
        del rng_key
        return init(position, loglikelihood_fn, n_schedule, batch_size)

    def step_fn(rng_key: PRNGKey, state, lmbda):
        return kernel(rng_key, state, num_mcmc_steps, lmbda, mcmc_parameters)

    return SamplingAlgorithm(init_fn, step_fn)
