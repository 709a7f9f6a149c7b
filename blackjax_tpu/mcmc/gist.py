"""GIST — Gibbs self-tuning — family spine (Bou-Rabee, Carpenter & Marsden
2024, Algorithm 1).

The Markov chain lives on phase space augmented with a *tuning parameter*
``alpha``.  A transition is three Gibbs/Metropolis moves:

1. Gibbs-refresh the momentum ``rho`` from the metric;
2. Gibbs-draw ``alpha ~ p(. | theta, rho)`` (the seam where each instance
   plugs in its self-tuning rule: a step-size search, a U-turn rollout, ...);
3. Metropolis-test the involution ``S o F(alpha)`` with the tuning-density
   log-ratio ``log p(alpha' | theta', rho') - log p(alpha | theta, rho)``
   folded into the acceptance exponent.

Instances implement the pair ``(tuning_parameter_fn, apply_fn)``; the
``apply_fn`` returns the log-ratio *directly* because Dirac tuning
densities (``gist_step_size``) have no standalone value away from their
atom.  The spine is branch-free (select-based accept), so it vmaps cleanly
over a chain axis.

Behavioral parity: ``blackjax/mcmc/gist.py`` (spine :14-45, step :143,
kernel :211).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import hmc, metrics
from blackjax_tpu.mcmc.integrators import IntegratorState
from blackjax_tpu.mcmc.proposal import safe_energy_diff
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "GISTState",
    "GISTInfo",
    "init",
    "build_transition",
    "build_kernel",
    "as_top_level_api",
]


class GISTState(NamedTuple):
    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


class GISTInfo(NamedTuple):
    """Transition diagnostics; ``acceptance_rate`` is the realized GIST
    acceptance probability with the tuning-density-ratio factor included."""

    momentum: ArrayTree
    tuning_parameter: ArrayTree
    is_accepted: Array
    is_divergent: Array
    acceptance_rate: Array
    energy: Array
    num_integration_steps: Array


def init(position: ArrayLikeTree, logdensity_fn: Callable) -> GISTState:
    state = hmc.init(position, logdensity_fn)
    return GISTState(state.position, state.logdensity, state.logdensity_grad)


def build_transition(divergence_threshold: float = 1000) -> Callable:
    """The shared GIST transition, returning the full ``(new_state, info,
    extra_info)`` triple.  Instance modules call this directly so they can
    splice ``extra_info`` (reverse search index, U-turn counts, ...) into
    their own richer Info tuples; :func:`build_kernel` narrows it to the
    public ``(state, info)`` contract."""

    def transition(
        rng_key: PRNGKey, state: GISTState, logdensity_fn: Callable,
        tuning_parameter_fn: Callable, apply_fn: Callable,
        inverse_mass_matrix: metrics.MetricTypes,
    ):
        metric = metrics.default_metric(inverse_mass_matrix)
        total_energy = lambda s: metric.kinetic_energy(s.momentum) - s.logdensity
        key_refresh, key_draw, key_test = jax.random.split(rng_key, 3)

        # Gibbs moves: momentum, then the tuning parameter.
        rho = metric.sample_momentum(key_refresh, state.position)
        z = IntegratorState(
            state.position, rho, state.logdensity, state.logdensity_grad
        )
        alpha, aux = tuning_parameter_fn(key_draw, z, logdensity_fn, metric)

        # Metropolis move through the alpha-indexed involution.
        z_star, log_tuning_ratio, extra_info = apply_fn(
            z, alpha, aux, logdensity_fn, metric
        )
        energy_star = total_energy(z_star)
        energy_drop = safe_energy_diff(total_energy(z), energy_star)
        log_accept = energy_drop + log_tuning_ratio
        p_accept = jnp.exp(jnp.minimum(log_accept, 0.0))
        accepted = jax.random.uniform(key_test) < p_accept

        landed = GISTState(z_star.position, z_star.logdensity, z_star.logdensity_grad)
        new_state = jax.tree.map(
            lambda prop, cur: jnp.where(accepted, prop, cur), landed, state
        )
        info = GISTInfo(
            rho,
            alpha,
            accepted,
            -energy_drop > divergence_threshold,
            p_accept,
            energy_star,
            extra_info.num_integration_steps,
        )
        return new_state, info, extra_info

    return transition


def build_kernel(divergence_threshold: float = 1000) -> Callable:
    """General GIST kernel over the ``(tuning_parameter_fn, apply_fn)``
    seam.  ``tuning_parameter_fn(key, state, logdensity_fn, metric) ->
    (alpha, aux)`` is the Gibbs draw; ``apply_fn(state, alpha, aux,
    logdensity_fn, metric) -> (proposal, log_tuning_density_ratio,
    extra_info)`` runs the involution and reports the tuning log-ratio."""
    transition = build_transition(divergence_threshold)

    def kernel(
        rng_key: PRNGKey, state: GISTState, logdensity_fn: Callable,
        tuning_parameter_fn: Callable, apply_fn: Callable,
        inverse_mass_matrix: metrics.MetricTypes,
    ) -> tuple[GISTState, GISTInfo]:
        new_state, info, _ = transition(
            rng_key, state, logdensity_fn, tuning_parameter_fn, apply_fn,
            inverse_mass_matrix,
        )
        return new_state, info

    return kernel


def as_top_level_api(
    logdensity_fn: Callable, inverse_mass_matrix: metrics.MetricTypes,
    tuning_parameter_fn: Callable, apply_fn: Callable, *,
    divergence_threshold: float = 1000,
) -> SamplingAlgorithm:
    """Internal building block; end users call ``gist_step_size`` /
    ``gist_trajectory_length``."""
    kernel = build_kernel(divergence_threshold)
    return build_sampling_algorithm(
        kernel, init, logdensity_fn,
        kernel_args=(tuning_parameter_fn, apply_fn, inverse_mass_matrix),
    )
