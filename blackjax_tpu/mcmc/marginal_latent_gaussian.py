"""Marginal auxiliary-gradient sampler for latent Gaussian models
(Titsias & Papaspiliopoulos 2018), with the prior covariance pre-diagonalized
by one SVD so every step is O(d^2) matvecs in the eigenbasis.

Behavioral parity target: ``blackjax/mcmc/marginal_latent_gaussian.py``
(``CovarianceSVD`` :60, kernel with Gamma(delta) recurrences).
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.scipy import linalg

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc.proposal import static_binomial_sampling
from blackjax_tpu.types import Array, ArrayLikeTree, PRNGKey

__all__ = [
    "MarginalState",
    "MarginalInfo",
    "CovarianceSVD",
    "svd_from_covariance",
    "init",
    "build_kernel",
    "as_top_level_api",
]


class MarginalState(NamedTuple):
    """Chain state plus the position/gradient projected into the prior
    covariance eigenbasis (precomputed to avoid re-projection)."""

    position: ArrayLikeTree
    logdensity: float
    logdensity_grad: ArrayLikeTree
    U_x: Array
    U_grad_x: Array


class CovarianceSVD(NamedTuple):
    U: Array
    Gamma: Array
    U_t: Array


class MarginalInfo(NamedTuple):
    acceptance_rate: float
    is_accepted: bool
    proposal: MarginalState


def svd_from_covariance(covariance: Array) -> CovarianceSVD:
    U, Gamma, U_t = jnp.linalg.svd(covariance, hermitian=True)
    return CovarianceSVD(U, Gamma, U_t)


def generate_mean_shifted_logprob(logdensity_fn, mean, covariance):
    """Fold a non-zero prior mean into the likelihood as the linear shift
    ``x . C^-1 m`` so the kernel can assume a centered prior."""
    mean_flat, _ = ravel_pytree(mean)
    shift = linalg.solve(covariance, mean_flat, assume_a="pos")

    def shifted(x):
        x_flat, _ = ravel_pytree(x)
        return logdensity_fn(x) + jnp.dot(x_flat, shift)

    return shifted


def init(position, logdensity_fn, U_t):
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    position_flat, _ = ravel_pytree(position)
    grad_flat, _ = ravel_pytree(logdensity_grad)
    return MarginalState(
        position, logdensity, logdensity_grad, U_t @ position_flat, U_t @ grad_flat
    )


def build_kernel(cov_svd: CovarianceSVD):
    """mGrad kernel; ``delta`` is the only tunable (target ~50% acceptance)."""
    U, Gamma, U_t = cov_svd

    def kernel(key: PRNGKey, state: MarginalState, logdensity_fn, delta):
        y_key, accept_key = jax.random.split(key)
        position, logdensity, logdensity_grad, U_x, U_grad_x = state
        position_flat, unravel = ravel_pytree(position)

        # delta-dependent spectral coefficients of the marginal proposal
        Gamma_1 = Gamma * delta / (delta + 2.0 * Gamma)
        Gamma_3 = (delta + 2.0 * Gamma) / (delta + 4.0 * Gamma)
        Gamma_2 = Gamma_1 / Gamma_3

        drift = Gamma_1 * (U_x / (0.5 * delta) + U_grad_x)
        noise = jnp.sqrt(Gamma_2) * jax.random.normal(y_key, position_flat.shape)
        y = unravel(U @ (drift + noise))

        log_p_y, grad_y = jax.value_and_grad(logdensity_fn)(y)
        y_flat, _ = ravel_pytree(y)
        grad_y_flat, _ = ravel_pytree(grad_y)
        U_y, U_grad_y = U_t @ y_flat, U_t @ grad_y_flat

        temp_x = Gamma_1 * (U_x / (0.5 * delta) + 0.5 * U_grad_x)
        temp_y = Gamma_1 * (U_y / (0.5 * delta) + 0.5 * U_grad_y)
        hxy = jnp.dot(U_x - temp_y, Gamma_3 * U_grad_y)
        hyx = jnp.dot(U_y - temp_x, Gamma_3 * U_grad_x)

        log_p_accept = log_p_y - logdensity + hxy - hyx
        proposed = MarginalState(y, log_p_y, grad_y, U_y, U_grad_y)
        accepted, (do_accept, p_accept, _) = static_binomial_sampling(
            accept_key, log_p_accept, state, proposed
        )
        return accepted, MarginalInfo(p_accept, do_accept, proposed)

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    covariance: Optional[Array] = None,
    mean: Optional[ArrayLikeTree] = None,
    cov_svd: Optional[CovarianceSVD] = None,
    step_size: float = 1.0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.mgrad_gaussian(...)`` for ``q(x) ∝ exp(f(x)) N(x; m, C)``."""
    if cov_svd is None:
        if covariance is None:
            raise ValueError("Either covariance or cov_svd must be provided.")
        cov_svd = svd_from_covariance(covariance)

    if mean is not None:
        logdensity_fn = generate_mean_shifted_logprob(logdensity_fn, mean, covariance)

    kernel = build_kernel(cov_svd)
    return build_sampling_algorithm(
        kernel, init, logdensity_fn, init_args=(cov_svd.U_t,), kernel_args=(step_size,)
    )
