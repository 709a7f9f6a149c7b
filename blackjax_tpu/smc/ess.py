"""Effective sample size of weighted particles + the tempering ESS solver.

Behavioral parity target: ``blackjax/smc/ess.py`` (log-ESS identity :23-52,
solver sign contract :89-96).
"""
from typing import Callable, Union

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from blackjax_tpu.types import Array, ArrayLikeTree

__all__ = ["ess", "log_ess", "ess_solver"]


def log_ess(log_weights: Array) -> Union[float, Array]:
    """``log ESS = 2 lse(w) - lse(2w)`` (Kong's estimator in log space)."""
    return 2.0 * logsumexp(log_weights) - logsumexp(2.0 * log_weights)


def ess(log_weights: Array) -> Union[float, Array]:
    return jnp.exp(log_ess(log_weights))


def ess_solver(
    logdensity_fn: Callable,
    particles: ArrayLikeTree,
    target_ess: Union[float, Array],
    max_delta: Union[float, Array],
    root_solver: Callable,
) -> Union[float, Array]:
    """Find the tempering increment ``delta`` such that the incremental
    weights ``delta * loglik`` have ESS equal to ``target_ess * N``.

    The sign of the weights here MUST match the tempered-SMC weight update
    (``delta * loglikelihood``): a flipped sign finds an increment targeting
    the wrong distribution, silently for symmetric log-likelihoods.
    """
    loglik = logdensity_fn(particles)
    n = loglik.shape[0]
    target_log_ess = jnp.log(n * target_ess)

    def objective(delta):
        return log_ess(jnp.nan_to_num(delta * loglik)) - target_log_ess

    return root_solver(objective, 0.0, max_delta)
