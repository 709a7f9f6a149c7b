"""General spine of the GIST (Gibbs self-tuning) sampler family
(Bou-Rabee, Carpenter & Marsden 2024, Algorithm 1).

The phase space is augmented with a tuning parameter ``alpha ~ p(. | theta,
rho)``; the proposal is a measure-preserving involution (momentum flip after
a reversible ``alpha``-indexed map), accepted by Metropolis with the tuning
density ratio folded into the acceptance log-probability.

Behavioral parity target: ``blackjax/mcmc/gist.py`` (family spine :14-45,
``_step`` :143, ``build_kernel`` :211). Concrete instances:
``gist_step_size`` and ``gist_trajectory_length``.
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import hmc, metrics
from blackjax_tpu.mcmc.integrators import IntegratorState
from blackjax_tpu.mcmc.proposal import safe_energy_diff
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["GISTState", "GISTInfo", "init", "build_kernel", "as_top_level_api"]


class GISTState(NamedTuple):
    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree


class GISTInfo(NamedTuple):
    """Transition diagnostics; ``acceptance_rate`` is the realized GIST
    acceptance probability including the tuning-density-ratio factor."""

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


def _step(
    rng_key: PRNGKey,
    state: GISTState,
    logdensity_fn: Callable,
    tuning_parameter_fn: Callable,
    apply_fn: Callable,
    inverse_mass_matrix: metrics.MetricTypes,
    divergence_threshold: float,
):
    """Gibbs-refresh momentum, Gibbs-draw alpha, apply the involution, one
    Metropolis test. Returns ``(new_state, info, extra_info)`` — instance
    modules consume ``extra_info`` for their richer Info tuples."""
    metric = metrics.default_metric(inverse_mass_matrix)
    key_momentum, key_tuning, key_accept = jax.random.split(rng_key, 3)

    position, logdensity, logdensity_grad = state
    momentum = metric.sample_momentum(key_momentum, position)
    integrator_state = IntegratorState(position, momentum, logdensity, logdensity_grad)

    alpha, aux = tuning_parameter_fn(key_tuning, integrator_state, logdensity_fn, metric)
    proposal_state, log_tuning_density_ratio, extra_info = apply_fn(
        integrator_state, alpha, aux, logdensity_fn, metric
    )

    initial_energy = -logdensity + metric.kinetic_energy(momentum)
    proposal_energy = -proposal_state.logdensity + metric.kinetic_energy(
        proposal_state.momentum
    )
    delta_energy = safe_energy_diff(initial_energy, proposal_energy)
    is_diverging = -delta_energy > divergence_threshold

    log_accept = delta_energy + log_tuning_density_ratio
    accept_prob = jnp.exp(jnp.minimum(log_accept, 0.0))
    do_accept = jax.random.uniform(key_accept) < accept_prob

    new_state = jax.tree.map(
        lambda new, old: jnp.where(do_accept, new, old),
        GISTState(
            proposal_state.position,
            proposal_state.logdensity,
            proposal_state.logdensity_grad,
        ),
        state,
    )
    info = GISTInfo(
        momentum,
        alpha,
        do_accept,
        is_diverging,
        accept_prob,
        proposal_energy,
        extra_info.num_integration_steps,
    )
    return new_state, info, extra_info


def build_kernel(divergence_threshold: float = 1000) -> Callable:
    """General GIST kernel. ``tuning_parameter_fn(key, state, logdensity_fn,
    metric) -> (alpha, aux)`` is the Gibbs draw; ``apply_fn(state, alpha,
    aux, logdensity_fn, metric) -> (proposal, log_tuning_density_ratio,
    extra_info)`` computes the involution and the tuning-density log-ratio
    directly (Dirac tuning densities have no standalone value)."""

    def kernel(
        rng_key: PRNGKey,
        state: GISTState,
        logdensity_fn: Callable,
        tuning_parameter_fn: Callable,
        apply_fn: Callable,
        inverse_mass_matrix: metrics.MetricTypes,
    ) -> tuple[GISTState, GISTInfo]:
        new_state, info, _ = _step(
            rng_key,
            state,
            logdensity_fn,
            tuning_parameter_fn,
            apply_fn,
            inverse_mass_matrix,
            divergence_threshold,
        )
        return new_state, info

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    inverse_mass_matrix: metrics.MetricTypes,
    tuning_parameter_fn: Callable,
    apply_fn: Callable,
    *,
    divergence_threshold: float = 1000,
) -> SamplingAlgorithm:
    """Internal building block; end users call ``gist_step_size`` /
    ``gist_trajectory_length``."""
    kernel = build_kernel(divergence_threshold)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(tuning_parameter_fn, apply_fn, inverse_mass_matrix),
    )
