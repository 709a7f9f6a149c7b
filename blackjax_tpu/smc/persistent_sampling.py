"""Persistent Sampling (Karamanis et al. 2025): tempered SMC that keeps ALL
past particles, resampling each iteration from the whole zero-padded history
with mixture-importance weights.

Behavioral parity target: ``blackjax/smc/persistent_sampling.py`` (state
:43, weights over history :258 [eqs. 14-15], logZ :228 [eq. 16], resampling
:361, step :445, kernel :556).

The mixture denominator here is computed with a streaming logsumexp
(running max + rescaled sum carried through a ``lax.scan`` over history
slots) rather than repeated ``logaddexp`` folds, and resampling maps flat
ancestor draws back to ``(slot, particle)`` coordinates with ``divmod``
instead of reshaping every leaf of the history.
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
    def num_particles(self) -> int:
        return self.persistent_log_likelihoods.shape[1]

    @property
    def persistent_weights(self) -> Array:
        logw, _ = compute_log_persistent_weights(
            self.persistent_log_likelihoods,
            self.persistent_log_Z,
            self.tempering_schedule,
            self.iteration,
            include_current=True,
        )
        return jnp.exp(logw)


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
    slots = n_schedule + 1
    n = jax.tree.leaves(particles)[0].shape[0]

    def alloc(x):
        return jnp.zeros((slots, *x.shape), x.dtype).at[0].set(x)

    logliks = map_fn(loglikelihood_fn, batch_size)(particles)
    return PersistentSMCState(
        jax.tree.map(alloc, particles),
        jnp.zeros((slots, n)).at[0].set(logliks),
        jnp.zeros(slots),
        jnp.zeros(slots),
        jnp.array(0),
    )


def remove_padding(state: PersistentSMCState) -> PersistentSMCState:
    """Host-side: trim the padded arrays to the current iteration."""
    upto = state.iteration + 1
    return PersistentSMCState(
        jax.tree.map(lambda x: x[:upto], state.persistent_particles),
        state.persistent_log_likelihoods[:upto],
        state.persistent_log_Z[:upto],
        state.tempering_schedule[:upto],
        state.iteration,
    )


def compute_log_Z(log_weights: Array, iteration) -> Array:
    """Normalizing-constant estimate (eq. 16): the mean of the unnormalized
    weights over the ``iteration * N`` live slots."""
    n = log_weights.shape[1]
    return logsumexp(log_weights) - jnp.log(n * jnp.asarray(iteration))


def _streaming_mixture_logsumexp(log_terms_fn, num_slots, horizon):
    """logsumexp of ``log_terms_fn(i)`` over ``i < horizon``, computed as a
    scan carrying (running max, sum rescaled onto it) — one pass, no
    ``(slots, slots, N)`` broadcast, no logaddexp chain."""

    def fold(carry, i):
        run_max, run_sum = carry
        term = jnp.where(i < horizon, log_terms_fn(i), -jnp.inf)
        new_max = jnp.maximum(run_max, term)
        # rescale both contributions onto the new max, guarding the
        # exp(-inf - -inf) case while nothing has been accumulated yet
        safe_max = jnp.where(jnp.isfinite(new_max), new_max, 0.0)
        run_sum = run_sum * jnp.exp(
            jnp.where(jnp.isfinite(run_max), run_max - safe_max, -jnp.inf)
        ) + jnp.exp(jnp.where(jnp.isfinite(term), term - safe_max, -jnp.inf))
        return (new_max, run_sum), None

    init_term = log_terms_fn(0)
    (final_max, final_sum), _ = jax.lax.scan(
        fold,
        (jnp.full_like(init_term, -jnp.inf), jnp.zeros_like(init_term)),
        jnp.arange(num_slots),
    )
    return jnp.where(
        jnp.isfinite(final_max), final_max + jnp.log(final_sum), -jnp.inf
    )


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
    denominator the equal-weight mixture of all past tempered distributions.
    Rows beyond the horizon get ``-inf``. Weights sum to ``iteration * N``
    unless ``normalize_to_one``."""
    horizon = iteration + 1 if include_current else iteration
    slots = persistent_log_likelihoods.shape[0]
    live = jnp.arange(slots)[:, None] < horizon

    def component(i):
        # log density (up to Z) of mixture member i at every stored particle
        return (
            tempering_schedule[i] * persistent_log_likelihoods - persistent_log_Z[i]
        )

    log_mix = _streaming_mixture_logsumexp(component, slots, horizon) - jnp.log(
        jnp.asarray(horizon, dtype=persistent_log_likelihoods.dtype)
    )

    target_logpdf = tempering_schedule[iteration] * persistent_log_likelihoods
    raw = jnp.where(live, target_logpdf - log_mix, -jnp.inf)

    log_Z = compute_log_Z(raw, horizon)
    logw = raw - log_Z
    if normalize_to_one:
        logw = logw - jnp.log(horizon * persistent_log_likelihoods.shape[1])
    return logw, log_Z


def resample_from_persistent(
    rng_key: PRNGKey,
    persistent_particles: ArrayLikeTree,
    persistent_weights: Array,
    resample_fn: Callable,
):
    """Draw N particles from the ``history x N`` ensemble; flat ancestor
    draws are mapped back to (slot, particle) coordinates with divmod."""
    n = persistent_weights.shape[1]
    ancestors = resample_fn(rng_key, persistent_weights.reshape(-1), n)
    slot_idx, within_idx = jnp.divmod(ancestors, n)
    particles = jax.tree.map(
        lambda x: x[slot_idx, within_idx], persistent_particles
    )
    return particles, ancestors


def compute_persistent_ess(log_persistent_weights: Array, normalize_weights: bool = False):
    """Kish ESS of the persistent ensemble (eq. 17; can exceed 1), computed
    in log space: ``exp(-logsumexp(2 log w))``."""
    if normalize_weights:
        log_persistent_weights = log_persistent_weights - logsumexp(
            log_persistent_weights
        )
    return jnp.exp(-logsumexp(2.0 * log_persistent_weights))


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
    (Karamanis et al. Algorithm 2): weight the whole history against the new
    target, resample N seeds from it, mutate them with the inner kernel, and
    append the result as the next history slot."""
    move_key, seed_key = jax.random.split(rng_key)
    slot = state.iteration + 1
    schedule = state.tempering_schedule.at[slot].set(lmbda)

    logw, log_Z = weight_fn(
        state.persistent_log_likelihoods,
        state.persistent_log_Z,
        schedule,
        slot,
        normalize_to_one=True,
    )
    seeds, ancestors = resample_from_persistent(
        seed_key, state.persistent_particles, jnp.exp(logw), resample_fn
    )

    moved, update_info = update_fn(
        jax.random.split(move_key, state.num_particles), seeds
    )
    moved_logliks = map_fn(loglikelihood_fn, batch_size)(moved)

    new_state = PersistentSMCState(
        jax.tree.map(
            lambda hist, cur: hist.at[slot].set(cur),
            state.persistent_particles,
            moved,
        ),
        state.persistent_log_likelihoods.at[slot].set(moved_logliks),
        state.persistent_log_Z.at[slot].set(log_Z),
        schedule,
        slot,
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

    def kernel(
        rng_key: PRNGKey,
        state: PersistentSMCState,
        num_mcmc_steps,
        lmbda,
        mcmc_parameters: dict,
    ) -> tuple[PersistentSMCState, PersistentStateInfo]:
        def tempered_logdensity(x):
            return logprior_fn(x) + lmbda * loglikelihood_fn(x)

        unshared, shared_step_fn = unshared_parameters_and_step_fn(
            mcmc_parameters, mcmc_step_fn
        )
        extra = {"batch_size": batch_size} if batch_size else {}
        mutate, _ = update_strategy(
            mcmc_init_fn,
            tempered_logdensity,
            shared_step_fn,
            num_mcmc_steps=num_mcmc_steps,
            n_particles=state.num_particles,
            **extra,
        )
        return step(
            rng_key,
            state,
            lmbda,
            loglikelihood_fn,
            lambda keys, particles: mutate(keys, particles, unshared),
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
