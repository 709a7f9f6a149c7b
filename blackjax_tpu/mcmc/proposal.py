"""Proposal bookkeeping for trajectory-building samplers.

Behavioral parity target: ``blackjax/mcmc/proposal.py`` (reference; ``Proposal``
at :24, NaN-safe energy diff at :45, progressive samplers at :118/:146, static
binomial MH at :214, non-reversible slice accept at :243).

TPU-first delta: accept/reject branches are *selects* (``jnp.where`` over the
state pytree), never ``lax.cond`` — under ``vmap`` over thousands of chains a
cond lowers to a select anyway, and writing it as a select keeps the lockstep
masked NUTS loop branch-free by construction.
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.types import Array, PRNGKey

__all__ = [
    "Proposal",
    "safe_energy_diff",
    "proposal_generator",
    "progressive_uniform_sampling",
    "progressive_biased_sampling",
    "compute_asymmetric_acceptance_ratio",
    "static_binomial_sampling",
    "nonreversible_slice_sampling",
    "tree_select",
]


def tree_select(pred, on_true, on_false):
    """Branch-free pytree select; `pred` may be a scalar or batched bool."""
    return jax.tree.map(lambda a, b: jnp.where(pred, a, b), on_true, on_false)


class Proposal(NamedTuple):
    """A candidate next state plus the trajectory statistics needed for
    progressive sampling: total canonical weight of the trajectory seen so
    far (log-sum of ``e^{-H}`` relative to the start) and the cumulated MH
    acceptance statistic."""

    state: NamedTuple
    energy: float
    weight: float
    sum_log_p_accept: float


def safe_energy_diff(initial_energy: float, new_energy: float) -> float:
    """``H0 - H1`` with NaN mapped to ``-inf`` so a diverged state can never
    be accepted (the numerical analogue of a sanitizer)."""
    delta = initial_energy - new_energy
    return jnp.where(jnp.isnan(delta), -jnp.inf, delta)


def proposal_generator(energy_fn: Callable) -> tuple[Callable, Callable]:
    """Return ``(new, update)``: ``new`` seeds a proposal at the trajectory
    start, ``update`` builds the proposal for a freshly integrated state with
    weight ``H0 - H(z)``."""

    def new(state) -> Proposal:
        return Proposal(state, energy_fn(state), 0.0, -jnp.inf)

    def update(initial_energy: float, new_state) -> Proposal:
        new_energy = energy_fn(new_state)
        delta = safe_energy_diff(initial_energy, new_energy)
        return Proposal(new_state, new_energy, delta, jnp.minimum(delta, 0.0))

    return new, update


def _merged_stats(proposal: Proposal, new_proposal: Proposal):
    weight = jnp.logaddexp(proposal.weight, new_proposal.weight)
    slpa = jnp.logaddexp(proposal.sum_log_p_accept, new_proposal.sum_log_p_accept)
    return weight, slpa


def progressive_uniform_sampling(
    rng_key: PRNGKey, proposal: Proposal, new_proposal: Proposal
) -> Proposal:
    """Reservoir-style multinomial sampling along the trajectory: the new
    state replaces the held proposal with probability
    ``w_new / (w_old + w_new)``."""
    p_accept = jax.scipy.special.expit(new_proposal.weight - proposal.weight)
    do_accept = jax.random.bernoulli(rng_key, p_accept)
    weight, slpa = _merged_stats(proposal, new_proposal)
    chosen = tree_select(do_accept, new_proposal.state, proposal.state)
    energy = jnp.where(do_accept, new_proposal.energy, proposal.energy)
    return Proposal(chosen, energy, weight, slpa)


def progressive_biased_sampling(
    rng_key: PRNGKey, proposal: Proposal, new_proposal: Proposal
) -> Proposal:
    """Betancourt's biased variant: favor the newer subtree by accepting with
    probability ``min(1, w_new / w_old)``, pushing transitions away from the
    trajectory's starting point."""
    p_accept = jnp.clip(jnp.exp(new_proposal.weight - proposal.weight), max=1.0)
    do_accept = jax.random.bernoulli(rng_key, p_accept)
    weight, slpa = _merged_stats(proposal, new_proposal)
    chosen = tree_select(do_accept, new_proposal.state, proposal.state)
    energy = jnp.where(do_accept, new_proposal.energy, proposal.energy)
    return Proposal(chosen, energy, weight, slpa)


def compute_asymmetric_acceptance_ratio(transition_energy_fn: Callable) -> Callable:
    """For asymmetric proposals: the log acceptance ratio is the difference
    of forward and reverse transition energies."""

    def log_acceptance_ratio(initial_state, state, **energy_params):
        forward = transition_energy_fn(initial_state, state, **energy_params)
        reverse = transition_energy_fn(state, initial_state, **energy_params)
        return safe_energy_diff(reverse, forward)

    return log_acceptance_ratio


def static_binomial_sampling(rng_key: PRNGKey, log_p_accept, proposal, new_proposal):
    """Classic Metropolis-Hastings accept/reject. Returns
    ``(chosen, (do_accept, p_accept, None))``."""
    p_accept = jnp.clip(jnp.exp(log_p_accept), max=1.0)
    do_accept = jax.random.bernoulli(rng_key, p_accept)
    chosen = tree_select(do_accept, new_proposal, proposal)
    return chosen, (do_accept, p_accept, None)


def nonreversible_slice_sampling(slice_var: Array, delta_energy, proposal, new_proposal):
    """Neal (2020) persistent-slice accept for non-reversible MH (used by
    GHMC): accept when ``log|u| <= delta_energy`` and deterministically update
    the slice variable instead of redrawing it."""
    p_accept = jnp.clip(jnp.exp(delta_energy), max=1.0)
    do_accept = jnp.log(jnp.abs(slice_var)) <= delta_energy
    next_slice = slice_var * jnp.where(do_accept, jnp.exp(-delta_energy), 1.0)
    chosen = tree_select(do_accept, new_proposal, proposal)
    return chosen, (do_accept, p_accept, next_slice)
