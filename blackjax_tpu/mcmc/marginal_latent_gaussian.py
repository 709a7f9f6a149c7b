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


def _spectral_view(logdensity_fn, U_t, position):
    """Evaluate density + gradient and project both into the eigenbasis."""
    logdensity, grad = jax.value_and_grad(logdensity_fn)(position)
    pos_flat, _ = ravel_pytree(position)
    grad_flat, _ = ravel_pytree(grad)
    return MarginalState(position, logdensity, grad, U_t @ pos_flat, U_t @ grad_flat)


def init(position, logdensity_fn, U_t):
    return _spectral_view(logdensity_fn, U_t, position)


def _proposal_gains(Gamma, delta):
    """Per-eigenvalue coefficients of the mGrad proposal in the half-step
    parameterization ``a = delta/2``: ``gain = a*g/(a+g)`` (the harmonic
    combination of step and prior scale, Gamma_1 of the paper) and
    ``mix = (a+g)/(a+2g)`` (Gamma_3); the proposal noise variance is
    ``gain/mix``."""
    a = 0.5 * delta
    gain = a * Gamma / (a + Gamma)
    mix = (a + Gamma) / (a + 2.0 * Gamma)
    return a, gain, mix


def build_kernel(cov_svd: CovarianceSVD):
    """mGrad kernel; ``delta`` is the only tunable (target ~50% acceptance)."""
    U, Gamma, U_t = cov_svd

    def kernel(key: PRNGKey, state: MarginalState, logdensity_fn, delta):
        proposal_key, accept_key = jax.random.split(key)
        a, gain, mix = _proposal_gains(Gamma, delta)
        _, unravel = ravel_pytree(state.position)

        mean_y = gain * (state.U_x / a + state.U_grad_x)
        white = jax.random.normal(proposal_key, mean_y.shape)
        y = unravel(U @ (mean_y + jnp.sqrt(gain / mix) * white))
        proposed = _spectral_view(logdensity_fn, U_t, y)

        # Hastings correction: h(x,y) - h(y,x) with
        # h(u,v) = <u - gain*(v/a + grad_v/2), mix * grad_v>
        def h(u_spec, v_spec, grad_v_spec):
            shadow = gain * (v_spec / a + 0.5 * grad_v_spec)
            return jnp.dot(u_spec - shadow, mix * grad_v_spec)

        log_p_accept = (
            proposed.logdensity
            - state.logdensity
            + h(state.U_x, proposed.U_x, proposed.U_grad_x)
            - h(proposed.U_x, state.U_x, state.U_grad_x)
        )
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
