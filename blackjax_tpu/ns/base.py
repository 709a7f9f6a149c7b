"""Nested sampling core: delete the worst-likelihood live points, resurrect
them through a likelihood-constrained inner kernel.

Behavioral parity target: ``blackjax/ns/base.py`` (state :59-88, kernel
:159, deletion :221).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey

__all__ = ["StateWithLogLikelihood", "NSState", "NSInfo", "init", "build_kernel", "delete_fn"]


class StateWithLogLikelihood(NamedTuple):
    """A particle: position, prior log-density, likelihood, and the
    likelihood contour it was born above."""

    position: ArrayLikeTree
    logdensity: Array
    loglikelihood: Array
    loglikelihood_birth: Array


class NSState(NamedTuple):
    particles: StateWithLogLikelihood


class NSInfo(NamedTuple):
    """The particles deleted ("dead") this step plus the inner update info."""

    particles: StateWithLogLikelihood
    update_info: NamedTuple


def init_state_strategy(
    position: ArrayLikeTree,
    logprior_fn: Callable,
    loglikelihood_fn: Callable,
    loglikelihood_birth: float = jnp.nan,
) -> StateWithLogLikelihood:
    """Default per-particle state construction (vmap over the live set)."""
    loglikelihood = loglikelihood_fn(position)
    return StateWithLogLikelihood(
        position,
        logprior_fn(position),
        loglikelihood,
        loglikelihood_birth * jnp.ones_like(loglikelihood),
    )


def init(
    positions: ArrayLikeTree,
    init_state_fn: Callable,
    loglikelihood_birth: float = jnp.nan,
) -> NSState:
    state = init_state_fn(positions)
    return NSState(
        state._replace(
            loglikelihood_birth=loglikelihood_birth
            * jnp.ones_like(state.loglikelihood_birth)
        )
    )


def build_kernel(delete_fn: Callable, inner_kernel: Callable) -> Callable:
    """One NS step: identify the dead set, resurrect replacements above the
    highest dead likelihood through ``inner_kernel``, scatter them back."""

    def kernel(rng_key: PRNGKey, state: NSState) -> tuple[NSState, NSInfo]:
        dead_idx, target_idx = delete_fn(state)
        dead_particles = jax.tree.map(lambda x: x[dead_idx], state.particles)

        rng_key, inner_key = jax.random.split(rng_key)
        loglikelihood_0 = dead_particles.loglikelihood.max()
        new_particles, update_info = inner_kernel(inner_key, state, loglikelihood_0)

        state = state._replace(
            particles=jax.tree.map(
                lambda p, n: p.at[target_idx].set(n), state.particles, new_particles
            )
        )
        return state, NSInfo(dead_particles, update_info)

    return kernel


def delete_fn(state: NSState, num_delete: int) -> tuple[Array, Array]:
    """The ``num_delete`` lowest-likelihood particles die; their slots are
    overwritten."""
    _, dead_idx = jax.lax.top_k(-state.particles.loglikelihood, num_delete)
    return dead_idx, dead_idx
