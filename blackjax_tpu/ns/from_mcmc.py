"""Build NS inner kernels from MCMC kernels under a hard likelihood
constraint.

Behavioral parity target: ``blackjax/ns/from_mcmc.py``
(``update_with_mcmc_take_last`` :50, ``reject_constrained_step`` :113).
"""
from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import random

from blackjax_tpu.ns.adaptive import build_kernel as build_adaptive_kernel
from blackjax_tpu.ns.base import delete_fn as default_delete_fn
from blackjax_tpu.types import PRNGKey

__all__ = ["ConstrainedMCMCInfo", "update_with_mcmc_take_last", "reject_constrained_step", "build_kernel"]


class ConstrainedMCMCInfo(NamedTuple):
    info: NamedTuple
    is_accepted: jnp.ndarray


def update_with_mcmc_take_last(constrained_mcmc_step_fn, num_mcmc_steps, num_delete):
    """Resurrect ``num_delete`` particles: start each from a random survivor
    above the contour, run the constrained kernel ``num_mcmc_steps`` times,
    keep the final state."""

    def update(rng_key, state, loglikelihood_0, **step_parameters):
        choice_key, sample_key = random.split(rng_key)
        particles = state.particles

        survivors = (particles.loglikelihood > loglikelihood_0).astype(jnp.float32)
        survivors = jnp.where(survivors.sum() > 0.0, survivors, jnp.ones_like(survivors))
        start_idx = random.choice(
            choice_key,
            survivors.shape[0],
            shape=(num_delete,),
            p=survivors / survivors.sum(),
            replace=True,
        )
        start = jax.tree.map(lambda x: x[start_idx], particles)

        step = partial(
            constrained_mcmc_step_fn, loglikelihood_0=loglikelihood_0, **step_parameters
        )

        def chain(rng_key, state):
            keys = random.split(rng_key, num_mcmc_steps)
            return jax.lax.scan(lambda s, k: step(k, s), state, keys)

        return jax.vmap(chain)(random.split(sample_key, num_delete), start)

    return update


def reject_constrained_step(
    init_state_fn: Callable,
    logdensity_fn: Callable,
    mcmc_init_fn: Callable,
    mcmc_step_fn: Callable,
) -> Callable:
    """Propose-then-reject constraint wrapper for kernels that can't gate the
    contour inside their proposal: a move counts only if the MCMC step
    accepted AND the new point is above the likelihood threshold."""

    def step(rng_key, state, loglikelihood_0, **params):
        mcmc_state = mcmc_init_fn(state.position, logdensity_fn)
        new_mcmc_state, mcmc_info = mcmc_step_fn(rng_key, mcmc_state, logdensity_fn, **params)
        proposed = init_state_fn(
            new_mcmc_state.position, loglikelihood_birth=loglikelihood_0
        )
        within_contour = proposed.loglikelihood > loglikelihood_0
        is_accepted = getattr(mcmc_info, "is_accepted", True) & within_contour
        new_state = jax.tree.map(
            lambda a, b: jnp.where(is_accepted, a, b), proposed, state
        )
        return new_state, ConstrainedMCMCInfo(mcmc_info, is_accepted)

    return step


def build_kernel(
    constrained_step_fn: Callable,
    num_inner_steps: int,
    update_inner_kernel_params_fn: Callable,
    num_delete: int = 1,
    delete_fn: Callable = default_delete_fn,
) -> Callable:
    """Generic NS engine from a constrained inner step (take-last update,
    adaptive parameter refresh, evidence integration)."""
    inner_kernel = update_with_mcmc_take_last(
        constrained_step_fn, num_inner_steps, num_delete
    )
    return build_adaptive_kernel(
        partial(delete_fn, num_delete=num_delete),
        inner_kernel,
        update_inner_kernel_params_fn=update_inner_kernel_params_fn,
    )
