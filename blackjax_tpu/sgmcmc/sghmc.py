"""Stochastic Gradient HMC (Chen et al. 2014).

Behavioral parity target: ``blackjax/sgmcmc/sghmc.py:31`` — L inner Euler
steps with fresh momentum each transition.
"""
from typing import Callable

import jax

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.sgmcmc import diffusions
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = ["init", "build_kernel", "as_top_level_api"]


def init(position: ArrayLikeTree) -> ArrayLikeTree:
    return position


def build_kernel(alpha: float = 0.01, beta: float = 0.0) -> Callable:
    integrator = diffusions.sghmc(alpha, beta)

    def kernel(
        rng_key: PRNGKey,
        position: ArrayLikeTree,
        grad_estimator: Callable,
        minibatch: ArrayLikeTree,
        step_size: float,
        num_integration_steps: int,
        temperature: float = 1.0,
    ) -> ArrayTree:
        momentum = generate_gaussian_noise(rng_key, position)

        def body(carry, key):
            position, momentum = carry
            grad = grad_estimator(position, minibatch)
            position, momentum = integrator(
                key, position, momentum, grad, step_size, temperature
            )
            return (position, momentum), None

        keys = jax.random.split(rng_key, num_integration_steps)
        (position, _), _ = jax.lax.scan(body, (position, momentum), keys)
        return position

    return kernel


def as_top_level_api(
    grad_estimator: Callable,
    num_integration_steps: int = 10,
    alpha: float = 0.01,
    beta: float = 0.0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.sghmc(...)``."""
    kernel = build_kernel(alpha, beta)

    def init_fn(position, rng_key=None):
        del rng_key
        return init(position)

    def step_fn(rng_key, state, minibatch, step_size, temperature=1.0):
        return kernel(
            rng_key,
            state,
            grad_estimator,
            minibatch,
            step_size,
            num_integration_steps,
            temperature,
        )

    return SamplingAlgorithm(init_fn, step_fn)
