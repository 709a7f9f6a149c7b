"""Euler solvers for diffusion processes used by gradient-based samplers.

Behavioral parity target: ``blackjax/mcmc/diffusions.py:32``.
"""
from typing import NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.types import ArrayTree
from blackjax_tpu.util import generate_gaussian_noise

__all__ = ["DiffusionState", "overdamped_langevin"]


class DiffusionState(NamedTuple):
    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


def overdamped_langevin(logdensity_grad_fn):
    """Euler-Maruyama step of the overdamped Langevin SDE
    ``dx = grad(logpi)(x) dt + sqrt(2) dW``."""

    def one_step(rng_key, state: DiffusionState, step_size: float, batch: tuple = ()):
        position, _, grad = state
        noise = generate_gaussian_noise(rng_key, position)
        new_position = jax.tree.map(
            lambda p, g, n: p + step_size * g + jnp.sqrt(2.0 * step_size) * n,
            position,
            grad,
            noise,
        )
        logdensity, logdensity_grad = logdensity_grad_fn(new_position, *batch)
        return DiffusionState(new_position, logdensity, logdensity_grad)

    return one_step
