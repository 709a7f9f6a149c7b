"""Generalized HMC: persistent momentum + non-reversible slice acceptance
(Horowitz-style one-step HMC usable with MEADS adaptation).

Behavioral parity target: ``blackjax/mcmc/ghmc.py`` (state :32, persistent
momentum update :203, metric dispatch from inverse scale :67).
"""
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import hmc, integrators, metrics
from blackjax_tpu.mcmc.proposal import nonreversible_slice_sampling
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.util import generate_gaussian_noise

__all__ = ["GHMCState", "init", "build_kernel", "as_top_level_api", "update_momentum"]


class GHMCState(NamedTuple):
    """Persistent-momentum chain state; also carries the persistent slice
    variable of the non-reversible MH update."""

    position: ArrayTree
    momentum: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree
    slice: float


def init(position: ArrayLikeTree, logdensity_fn: Callable, rng_key: PRNGKey) -> GHMCState:
    key_momentum, key_slice = jax.random.split(rng_key)
    logdensity, logdensity_grad = jax.value_and_grad(logdensity_fn)(position)
    return GHMCState(
        position,
        generate_gaussian_noise(key_momentum, position),
        logdensity,
        logdensity_grad,
        jax.random.uniform(key_slice, minval=-1.0, maxval=1.0),
    )


def _metric_from_momentum_inverse_scale(
    momentum_inverse_scale: Union[ArrayLikeTree, metrics.MetricTypes],
) -> metrics.Metric:
    """Rich metric objects (Metric / low-rank payload / callable / dense
    (d,d) array) pass straight through ``default_metric``; the legacy
    scalar / 1-D / position-shaped-pytree form is a per-dimension inverse
    *scale* squared into an inverse variance (the MEADS convention)."""
    x = momentum_inverse_scale
    if (
        isinstance(x, (metrics.Metric, metrics.LowRankInverseMassMatrix))
        or callable(x)
        or (hasattr(x, "ndim") and x.ndim >= 2)
    ):
        return metrics.default_metric(x)
    return metrics.default_metric(ravel_pytree(x)[0] ** 2)


def update_momentum(rng_key, state, alpha, momentum_generator):
    """Partial momentum refresh: mix the persistent momentum with a fresh
    Gaussian draw, ``p <- sqrt(1-alpha) p + sqrt(alpha) eps`` (an O-U
    half-step that preserves the momentum marginal)."""
    keep, inject = jnp.sqrt(1.0 - alpha), jnp.sqrt(alpha)
    fresh = momentum_generator(rng_key, state.position)
    return jax.tree.map(
        lambda p, eps: keep * p + inject * eps, state.momentum, fresh
    )


def _advance_slice(slice_var, delta, noise):
    """Deterministic non-reversible translation of the slice variable on
    the wrapped interval [-1, 1)."""
    return jnp.mod(slice_var + delta + noise + 1.0, 2.0) - 1.0


def build_kernel(noise_fn: Callable = lambda _: 0.0, divergence_threshold: float = 1000):
    """One velocity-Verlet step with persistent momentum; acceptance via the
    Neal (2020) persistent-slice scheme, slice translated by ``delta`` (plus
    optional noise) each step and momentum flipped on the output so
    rejections reverse direction."""

    def kernel(
        rng_key: PRNGKey,
        state: GHMCState,
        logdensity_fn: Callable,
        step_size: float,
        momentum_inverse_scale: Union[ArrayLikeTree, metrics.MetricTypes],
        alpha: float,
        delta: float,
    ) -> tuple[GHMCState, hmc.HMCInfo]:
        metric = _metric_from_momentum_inverse_scale(momentum_inverse_scale)
        integrator = integrators.velocity_verlet(logdensity_fn, metric.kinetic_energy)
        generate = hmc.hmc_proposal(
            integrator,
            metric.kinetic_energy,
            step_size,
            divergence_threshold=divergence_threshold,
            sample_proposal=nonreversible_slice_sampling,
        )

        key_momentum, key_noise = jax.random.split(rng_key)
        momentum = update_momentum(key_momentum, state, alpha, metric.sample_momentum)
        slice_var = _advance_slice(state.slice, delta, noise_fn(key_noise))

        integrator_state = integrators.IntegratorState(
            state.position, momentum, state.logdensity, state.logdensity_grad
        )
        # the slice variable rides in the sampler's key slot (the
        # non-reversible accept consumes it instead of randomness)
        proposal, info, next_slice = generate(slice_var, integrator_state)
        proposal = hmc.flip_momentum(proposal)
        return (
            GHMCState(
                proposal.position,
                proposal.momentum,
                proposal.logdensity,
                proposal.logdensity_grad,
                next_slice,
            ),
            info,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    momentum_inverse_scale: Union[ArrayLikeTree, metrics.MetricTypes],
    alpha: float,
    delta: float,
    *,
    divergence_threshold: int = 1000,
    noise_gn: Callable = lambda _: 0.0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.ghmc(...)``."""
    kernel = build_kernel(noise_gn, divergence_threshold)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, momentum_inverse_scale, alpha, delta),
        pass_rng_key_to_init=True,
    )
