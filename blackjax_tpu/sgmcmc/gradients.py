"""Minibatch gradient estimators for stochastic-gradient MCMC.

Behavioral parity target: ``blackjax/sgmcmc/gradients.py`` (simple estimator
:22, control variates :85).
"""
from typing import Callable

import jax
import jax.numpy as jnp

from blackjax_tpu.types import ArrayLikeTree, ArrayTree

__all__ = ["logdensity_estimator", "grad_estimator", "control_variates"]


def logdensity_estimator(
    logprior_fn: Callable, loglikelihood_fn: Callable, data_size: int
) -> Callable:
    """Unbiased log-posterior estimate from a minibatch:
    ``prior + N * mean(loglik over batch)``."""

    def estimate(position: ArrayLikeTree, minibatch: ArrayLikeTree) -> ArrayTree:
        batch_loglik = jax.vmap(loglikelihood_fn, in_axes=(None, 0))
        return logprior_fn(position) + data_size * jnp.mean(
            batch_loglik(position, minibatch), axis=0
        )

    return estimate


def grad_estimator(
    logprior_fn: Callable, loglikelihood_fn: Callable, data_size: int
) -> Callable:
    """Gradient of :func:`logdensity_estimator`."""
    return jax.grad(logdensity_estimator(logprior_fn, loglikelihood_fn, data_size))


def control_variates(
    logdensity_grad_estimator: Callable,
    centering_position: ArrayLikeTree,
    data: ArrayLikeTree,
) -> Callable:
    """Variance-reduced gradient estimator centered at a reference position
    (typically the MAP): ``grad_full(c) + grad_batch(x) - grad_batch(c)``."""
    center_full_grad = logdensity_grad_estimator(centering_position, data)

    def estimate(position: ArrayLikeTree, minibatch: ArrayLikeTree) -> ArrayTree:
        batch_grad = logdensity_grad_estimator(position, minibatch)
        center_batch_grad = logdensity_grad_estimator(centering_position, minibatch)
        return jax.tree.map(
            lambda g, cg, cf: cf + g - cg, batch_grad, center_batch_grad, center_full_grad
        )

    return estimate
