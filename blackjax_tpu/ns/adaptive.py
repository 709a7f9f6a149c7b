"""Adaptive nested sampling: inner-kernel parameters retuned from the live
set each step, evidence accumulated on the fly.

Behavioral parity target: ``blackjax/ns/adaptive.py`` (:97).
"""
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from blackjax_tpu.ns.base import NSInfo, NSState, StateWithLogLikelihood
from blackjax_tpu.ns.base import build_kernel as base_build_kernel
from blackjax_tpu.ns.base import init as base_init
from blackjax_tpu.ns.integrator import NSIntegrator, init_integrator, update_integrator
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["AdaptiveNSState", "init", "build_kernel"]


class AdaptiveNSState(NamedTuple):
    particles: StateWithLogLikelihood
    integrator: NSIntegrator
    inner_kernel_params: dict


def init(
    positions: ArrayLikeTree,
    init_state_fn: Callable,
    loglikelihood_birth: float = jnp.nan,
    update_inner_kernel_params_fn: Optional[Callable] = None,
    rng_key: Optional[PRNGKey] = None,
) -> AdaptiveNSState:
    base_state = base_init(positions, init_state_fn, loglikelihood_birth)
    params = {}
    if update_inner_kernel_params_fn is not None:
        params = update_inner_kernel_params_fn(rng_key, base_state, None, {})
    return AdaptiveNSState(
        base_state.particles, init_integrator(base_state.particles), params
    )


def build_kernel(
    delete_fn: Callable,
    inner_kernel: Callable,
    update_inner_kernel_params_fn: Callable,
) -> Callable:
    """Each step: run the base NS kernel with the carried inner-kernel
    parameters, retune them from the new live set + this step's info, and
    advance the evidence integrator."""

    def kernel(rng_key: PRNGKey, state: AdaptiveNSState) -> tuple[AdaptiveNSState, NSInfo]:
        step = base_build_kernel(
            delete_fn, partial(inner_kernel, **state.inner_kernel_params)
        )
        new_state, info = step(rng_key, state)
        params_key, rng_key = jax.random.split(rng_key)
        new_params = update_inner_kernel_params_fn(
            params_key, new_state, info, new_state.inner_kernel_params
        )
        new_integrator = update_integrator(
            state.integrator, new_state.particles, info.particles
        )
        return AdaptiveNSState(new_state.particles, new_integrator, new_params), info

    return kernel
