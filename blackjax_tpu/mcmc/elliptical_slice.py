"""Elliptical slice sampling for Gaussian-prior posteriors
(Murray, Adams & MacKay 2010).

Behavioral parity target: ``blackjax/mcmc/elliptical_slice.py``
(proposal/shrinkage loop :164).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = ["EllipSliceState", "EllipSliceInfo", "init", "build_kernel", "as_top_level_api"]


class EllipSliceState(NamedTuple):
    position: ArrayTree
    logdensity: ArrayTree


class EllipSliceInfo(NamedTuple):
    momentum: ArrayTree
    theta: float
    subiter: int


def init(position: ArrayLikeTree, logdensity_fn: Callable):
    return EllipSliceState(position, logdensity_fn(position))


def ellipsis(position, momentum, theta, mean):
    """Rotate (position, momentum) by angle theta on the ellipse through
    both, centered at the prior mean."""
    cos_t, sin_t = jnp.cos(theta), jnp.sin(theta)
    new_position = jax.tree.map(
        lambda p, m, mu: (p - mu) * cos_t + (m - mu) * sin_t + mu,
        position,
        momentum,
        mean,
    )
    new_momentum = jax.tree.map(
        lambda p, m, mu: (m - mu) * cos_t - (p - mu) * sin_t + mu,
        position,
        momentum,
        mean,
    )
    return new_position, new_momentum


def elliptical_proposal(
    logdensity_fn: Callable, momentum_generator: Callable, mean: Array
) -> Callable:
    """Slice-sample an angle on the ellipse through the current position and
    a fresh prior draw, shrinking the bracket toward theta = 0 on rejection
    (guaranteed to terminate for continuous likelihoods)."""

    def generate(rng_key: PRNGKey, state: EllipSliceState):
        position, logdensity = state
        flat, unravel = ravel_pytree(position)
        mean_tree = unravel(jnp.broadcast_to(jnp.asarray(mean), flat.shape))
        key_slice, key_momentum, key_uniform, key_theta = jax.random.split(rng_key, 4)

        momentum = momentum_generator(key_momentum, position)
        log_slice = logdensity + jnp.log(jax.random.uniform(key_uniform))
        theta = 2.0 * jnp.pi * jax.random.uniform(key_theta)
        theta_min, theta_max = theta - 2.0 * jnp.pi, theta
        proposed, new_momentum = ellipsis(position, momentum, theta, mean_tree)
        proposed_logdensity = logdensity_fn(proposed)

        def shrink(carry):
            _, subiter, theta, theta_min, theta_max, *_ = carry
            theta = jax.random.uniform(
                jax.random.fold_in(key_slice, subiter), minval=theta_min, maxval=theta_max
            )
            proposed, new_momentum = ellipsis(position, momentum, theta, mean_tree)
            proposed_logdensity = logdensity_fn(proposed)
            theta_min = jnp.where(theta < 0, theta, theta_min)
            theta_max = jnp.where(theta > 0, theta, theta_max)
            return (
                proposed_logdensity,
                subiter + 1,
                theta,
                theta_min,
                theta_max,
                proposed,
                new_momentum,
            )

        proposed_logdensity, subiter, theta, *_, proposed, new_momentum = (
            jax.lax.while_loop(
                lambda carry: carry[0] <= log_slice,
                shrink,
                (proposed_logdensity, 1, theta, theta_min, theta_max, proposed, new_momentum),
            )
        )
        return (
            EllipSliceState(proposed, proposed_logdensity),
            EllipSliceInfo(new_momentum, theta, subiter),
        )

    return generate


def build_kernel(cov_matrix: Array, mean: Array):
    """Elliptical slice kernel for a Gaussian prior ``N(mean, cov_matrix)``
    (diagonal 1-d or dense 2-d covariance)."""
    ndim = jnp.ndim(cov_matrix)
    if ndim == 1:
        cov_sqrt = jnp.sqrt(cov_matrix)
    elif ndim == 2:
        cov_sqrt = jax.lax.linalg.cholesky(cov_matrix)
    else:
        raise ValueError(
            f"The covariance matrix must be 1-d or 2-d; got ndim={ndim}."
        )

    def momentum_generator(rng_key, position):
        return generate_gaussian_noise(rng_key, position, mean, cov_sqrt)

    def kernel(rng_key: PRNGKey, state: EllipSliceState, logdensity_fn: Callable):
        generate = elliptical_proposal(logdensity_fn, momentum_generator, mean)
        return generate(rng_key, state)

    return kernel


def as_top_level_api(loglikelihood_fn: Callable, *, mean: Array, cov: Array) -> SamplingAlgorithm:
    """``blackjax_tpu.elliptical_slice(...)``: ``loglikelihood_fn`` is the
    likelihood only; the Gaussian prior is specified by ``mean``/``cov``."""
    kernel = build_kernel(cov, mean)
    return build_sampling_algorithm(kernel, init, loglikelihood_fn)
