"""Euler solvers for the stochastic-gradient diffusion families.

Behavioral parity target: ``blackjax/sgmcmc/diffusions.py`` (overdamped
Langevin :26, SGHMC friction/noise form :55, SGNHT thermostat :90).
"""
import operator
from typing import Callable

import jax
import jax.numpy as jnp

from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise, pytree_size

__all__ = ["overdamped_langevin", "sghmc", "sgnht"]


def overdamped_langevin() -> Callable:
    """One Euler step of ``dx = g dt + sqrt(2 T) dW``."""

    def one_step(rng_key, position, logdensity_grad, step_size, temperature=1.0):
        noise = generate_gaussian_noise(rng_key, position)
        return jax.tree.map(
            lambda p, g, n: p
            + step_size * g
            + jnp.sqrt(2.0 * temperature * step_size) * n,
            position,
            logdensity_grad,
            noise,
        )

    return one_step


def sghmc(alpha: float = 0.01, beta: float = 0.0) -> Callable:
    """Underdamped dynamics with friction ``alpha`` and gradient-noise
    estimate ``beta`` (Ma et al. 2015 scaling)."""

    def one_step(rng_key, position, momentum, logdensity_grad, step_size, temperature=1.0):
        noise = generate_gaussian_noise(rng_key, position)
        new_position = jax.tree.map(lambda x, p: x + step_size * p, position, momentum)
        noise_scale = jnp.sqrt(
            step_size * temperature * (2.0 * alpha - step_size * temperature * beta)
        )
        new_momentum = jax.tree.map(
            lambda p, g, n: (1.0 - alpha * step_size) * p + step_size * g + noise_scale * n,
            momentum,
            logdensity_grad,
            noise,
        )
        return new_position, new_momentum

    return one_step


def sgnht(alpha: float = 0.01, beta: float = 0.0) -> Callable:
    """SGHMC with an adaptive thermostat ``xi`` replacing the fixed friction;
    ``xi`` relaxes toward the kinetic temperature."""

    def one_step(
        rng_key, position, momentum, xi, logdensity_grad, step_size, temperature=1.0
    ):
        noise = generate_gaussian_noise(rng_key, position)
        new_position = jax.tree.map(lambda x, p: x + step_size * p, position, momentum)
        noise_scale = jnp.sqrt(
            step_size * temperature * (2.0 * alpha - step_size * temperature * beta)
        )
        new_momentum = jax.tree.map(
            lambda p, g, n: (1.0 - xi * step_size) * p + step_size * g + noise_scale * n,
            momentum,
            logdensity_grad,
            noise,
        )
        momentum_sq = jax.tree.reduce(
            operator.add, jax.tree.map(lambda x: jnp.sum(x * x), new_momentum)
        )
        new_xi = xi + step_size * (momentum_sq / pytree_size(new_momentum) - temperature)
        return new_position, new_momentum, new_xi

    return one_step
