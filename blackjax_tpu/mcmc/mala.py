"""Metropolis-Adjusted Langevin Algorithm.

Behavioral parity target: ``blackjax/mcmc/mala.py`` (transition-energy
asymmetry correction :68-118).
"""
import operator
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import diffusions, proposal
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["MALAState", "MALAInfo", "init", "build_kernel", "as_top_level_api"]


class MALAState(NamedTuple):
    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


class MALAInfo(NamedTuple):
    acceptance_rate: float
    is_accepted: bool


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> MALAState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return MALAState(position, logdensity, logdensity_grad)


def build_kernel():
    """One overdamped-Langevin Euler proposal + MH correction. The proposal
    is asymmetric, so the acceptance ratio uses the forward/reverse
    transition energies ``-logpi(y) + ||x - y - eps*grad(y)||^2 / (4 eps)``."""

    def transition_energy(state, new_state, step_size):
        displaced = jax.tree.map(
            lambda x, y, g: x - y - step_size * g,
            state.position,
            new_state.position,
            new_state.logdensity_grad,
        )
        sq_norm = jax.tree.reduce(
            operator.add, jax.tree.map(lambda v: jnp.sum(v * v), displaced)
        )
        return -new_state.logdensity + 0.25 * sq_norm / step_size

    log_acceptance_ratio = proposal.compute_asymmetric_acceptance_ratio(transition_energy)

    def kernel(
        rng_key: PRNGKey, state: MALAState, logdensity_fn: Callable, step_size: float
    ) -> tuple[MALAState, MALAInfo]:
        integrator = diffusions.overdamped_langevin(jax.value_and_grad(logdensity_fn))
        key_diffusion, key_accept = jax.random.split(rng_key)
        new_state = MALAState(*integrator(key_diffusion, state, step_size))
        log_p_accept = log_acceptance_ratio(state, new_state, step_size=step_size)
        accepted, (do_accept, p_accept, _) = proposal.static_binomial_sampling(
            key_accept, log_p_accept, state, new_state
        )
        return accepted, MALAInfo(p_accept, do_accept)

    return kernel


def as_top_level_api(logdensity_fn: Callable, step_size: float) -> SamplingAlgorithm:
    """``blackjax_tpu.mala(...)``."""
    kernel = build_kernel()
    return build_sampling_algorithm(kernel, init, logdensity_fn, kernel_args=(step_size,))
