"""Barker's robust gradient-based proposal (Livingstone & Zanella 2022).

Behavioral parity target: ``blackjax/mcmc/barker.py`` (metric-aware
sampling :244, acceptance ratio :83-120). The skewed proposal flips each
Gaussian increment's sign with probability ``sigmoid(grad * z)``, giving
gradient information with random-walk-like robustness to step size.
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.scipy import stats

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import metrics
from blackjax_tpu.mcmc.proposal import static_binomial_sampling
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, Numeric, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = ["BarkerState", "BarkerInfo", "init", "build_kernel", "as_top_level_api"]


class BarkerState(NamedTuple):
    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


class BarkerInfo(NamedTuple):
    acceptance_rate: float
    is_accepted: bool
    proposal: BarkerState


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> BarkerState:
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return BarkerState(position, logdensity, logdensity_grad)


def _log1pexp(a):
    return jnp.log1p(jnp.exp(a))


def _bernoulli_tree(rng_key, position, p):
    leaves = jax.tree.leaves(position)
    keys = jax.tree.unflatten(
        jax.tree.structure(position), list(jax.random.split(rng_key, len(leaves)))
    )
    return jax.tree.map(
        lambda k, pos, prob: jax.random.bernoulli(k, p=prob, shape=pos.shape),
        keys,
        position,
        p,
    )


def _barker_sample(key, mean, grad, scale, metric):
    """Draw from the metric-aware Barker proposal centered at ``mean`` with
    skewness from the gradient: in the whitened frame each Gaussian
    increment z keeps its sign with probability ``sigmoid(c * z)`` where
    ``c`` is the whitened gradient."""
    key_noise, key_flip = jax.random.split(key)
    z = generate_gaussian_noise(key_noise, mean, sigma=scale)
    c = metric.scale(mean, grad, inv=False, trans=True)

    log_p = jax.tree.map(lambda ci, zi: -_log1pexp(-ci * zi), c, z)
    p = jax.tree.map(jnp.exp, log_p)
    keep = _bernoulli_tree(key_flip, mean, p=p)
    flipped = jax.tree.map(lambda b, zi: b * zi - (1 - b) * zi, keep, z)
    return jax.tree.map(
        jnp.add, mean, metric.scale(mean, flipped, inv=False, trans=False)
    )


def _barker_logpdf(x, mean, a, scale):
    return (
        jnp.log(2.0) + stats.norm.logpdf(x, mean, scale) - _log1pexp(-a * (x - mean))
    )


def build_kernel():
    """Barker MH kernel; optional metric support through
    ``metrics.default_metric``."""

    def log_acceptance_ratio(
        state: BarkerState, proposal: BarkerState, metric: metrics.Metric
    ) -> Numeric:
        x, y = state.position, proposal.position
        y_minus_x = jax.tree.map(jnp.subtract, y, x)
        x_minus_y = jax.tree.map(jnp.negative, y_minus_x)
        z_xy = metric.scale(x, y_minus_x, inv=True, trans=True)
        z_yx = metric.scale(y, x_minus_y, inv=True, trans=True)
        c_xy = metric.scale(x, state.logdensity_grad, inv=False, trans=True)
        c_yx = metric.scale(y, proposal.logdensity_grad, inv=False, trans=True)

        sum_log1pexp_yx = sum(
            jnp.sum(leaf)
            for leaf in jax.tree.leaves(
                jax.tree.map(lambda z, c: _log1pexp(-z * c), z_yx, c_yx)
            )
        )
        sum_log1pexp_xy = sum(
            jnp.sum(leaf)
            for leaf in jax.tree.leaves(
                jax.tree.map(lambda z, c: _log1pexp(-z * c), z_xy, c_xy)
            )
        )
        # n-fold kinetic term matches the reference's broadcast-then-sum
        # formulation exactly (``barker.py:115-119``)
        n = sum(leaf.size for leaf in jax.tree.leaves(x))
        ratio_proposal = (
            n * metric.kinetic_energy(x_minus_y, y)
            - sum_log1pexp_yx
            - n * metric.kinetic_energy(y_minus_x, x)
            + sum_log1pexp_xy
        )
        return proposal.logdensity - state.logdensity + ratio_proposal

    def kernel(
        rng_key: PRNGKey,
        state: BarkerState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: Optional[metrics.MetricTypes] = None,
    ) -> tuple[BarkerState, BarkerInfo]:
        if inverse_mass_matrix is None:
            d = sum(leaf.size for leaf in jax.tree.leaves(state.position))
            inverse_mass_matrix = jnp.ones((d,))
        metric = metrics.default_metric(inverse_mass_matrix)
        key_sample, key_accept = jax.random.split(rng_key)

        proposed_position = _barker_sample(
            key_sample, state.position, state.logdensity_grad, step_size, metric
        )
        logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(proposed_position)
        proposed = BarkerState(proposed_position, logdensity, logdensity_grad)

        log_p_accept = log_acceptance_ratio(state, proposed, metric)
        accepted, (do_accept, p_accept, _) = static_binomial_sampling(
            key_accept, log_p_accept, state, proposed
        )
        return accepted, BarkerInfo(p_accept, do_accept, proposed)

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    inverse_mass_matrix: Optional[metrics.MetricTypes] = None,
) -> SamplingAlgorithm:
    """``blackjax_tpu.barker(...)``."""
    kernel = build_kernel()
    return build_sampling_algorithm(
        kernel, init, logdensity_fn, kernel_args=(step_size, inverse_mass_matrix)
    )
