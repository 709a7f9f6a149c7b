"""GIST with a self-tuned trajectory length: the step count is drawn from
the U-turn-path interval (Bou-Rabee et al. §2.2 — a linear no-return
rollout, not NUTS doubling).

Behavioral parity target: ``blackjax/mcmc/gist_trajectory_length.py``
(``num_steps_to_uturn`` :103, step distribution from the path fraction
:178-186).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import gist, hmc, integrators, metrics, trajectory
from blackjax_tpu.mcmc.integrators import IntegratorState
from blackjax_tpu.types import Array, PRNGKey

__all__ = [
    "GISTTrajectoryLengthInfo",
    "init",
    "num_steps_to_uturn",
    "build_kernel",
    "as_top_level_api",
]

init = gist.init


class _TrajectoryLengthExtra(NamedTuple):
    num_integration_steps: Array
    num_steps_to_uturn_forward: Array
    num_steps_to_uturn_reverse: Array
    is_no_return_rejected: Array


class GISTTrajectoryLengthInfo(NamedTuple):
    """GISTInfo fields plus forward/reverse U-turn step counts and the
    no-return rejection category."""

    momentum: Array
    tuning_parameter: Array
    is_accepted: Array
    is_divergent: Array
    acceptance_rate: Array
    energy: float
    num_integration_steps: Array
    num_steps_to_uturn_forward: Array
    num_steps_to_uturn_reverse: Array
    is_no_return_rejected: Array


def num_steps_to_uturn(
    integrator: Callable, step_size: float, metric: metrics.Metric, max_num_steps: int
) -> Callable:
    """``U(theta, rho)``: roll forward one leapfrog at a time until the
    displacement-velocity dot product turns negative, velocity measured as
    ``M^{-1} rho`` so the criterion respects the metric. Capped at
    ``max_num_steps`` (a capped U stays a valid conditional density)."""
    velocity_fn = jax.grad(metric.kinetic_energy)

    def uturn_fn(state: IntegratorState, logdensity_fn: Callable) -> Array:
        symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
        theta0, _ = ravel_pytree(state.position)

        def cond_fn(carry):
            n, _, no_return = carry
            return ~no_return & (n < max_num_steps)

        def body_fn(carry):
            n, current, _ = carry
            nxt = symplectic_integrator(current, step_size)
            delta = ravel_pytree(nxt.position)[0] - theta0
            velocity, _ = ravel_pytree(velocity_fn(nxt.momentum, nxt.position))
            return n + 1, nxt, jnp.dot(delta, velocity) < 0.0

        n_final, _, _ = jax.lax.while_loop(
            cond_fn, body_fn, (jnp.asarray(0), state, jnp.asarray(False))
        )
        return n_final

    return uturn_fn


def _step_distribution(uturn_steps: Array, path_fraction: float):
    """Interval ``[Lo, U]`` from which the step count is drawn uniformly
    (eqs. 34-35)."""
    lo = jnp.maximum(1, jnp.floor(path_fraction * uturn_steps).astype(jnp.int32))
    return lo, uturn_steps - lo + 1


def _tuning_parameter_fn(integrator, step_size, max_num_steps, path_fraction):
    def tuning_parameter_fn(rng_key, state, logdensity_fn, metric):
        uturn_fn = num_steps_to_uturn(integrator, step_size, metric, max_num_steps)
        forward = uturn_fn(state, logdensity_fn)
        lo, _ = _step_distribution(forward, path_fraction)
        num_steps = jax.random.randint(rng_key, (), minval=lo, maxval=forward + 1)
        return num_steps, forward

    return tuning_parameter_fn


def _apply_fn(integrator, step_size, max_num_steps, path_fraction):
    def apply_fn(state, alpha, aux, logdensity_fn, metric):
        num_steps, forward = alpha, aux
        symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
        build_trajectory = trajectory.static_integration(symplectic_integrator)
        proposal_state = hmc.flip_momentum(
            build_trajectory(state, step_size, num_steps)
        )

        uturn_fn = num_steps_to_uturn(integrator, step_size, metric, max_num_steps)
        reverse = uturn_fn(proposal_state, logdensity_fn)

        _, width_forward = _step_distribution(forward, path_fraction)
        lo_reverse, width_reverse = _step_distribution(reverse, path_fraction)

        in_reverse_interval = (num_steps >= lo_reverse) & (num_steps <= reverse)
        log_tuning_density_ratio = jnp.where(
            in_reverse_interval,
            jnp.log(width_forward.astype(jnp.float32))
            - jnp.log(width_reverse.astype(jnp.float32)),
            -jnp.inf,
        )
        extra = _TrajectoryLengthExtra(
            num_steps, forward, reverse, ~in_reverse_interval
        )
        return proposal_state, log_tuning_density_ratio, extra

    return apply_fn


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    path_fraction: float = 0.5,
    max_num_steps: int = 1024,
) -> Callable:
    """``gist_trajectory_length`` kernel (``path_fraction`` = psi, 0.5 per
    the paper's recommendation)."""

    def kernel(
        rng_key: PRNGKey,
        state: gist.GISTState,
        logdensity_fn: Callable,
        step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
    ) -> tuple[gist.GISTState, GISTTrajectoryLengthInfo]:
        new_state, info, extra = gist._step(
            rng_key,
            state,
            logdensity_fn,
            _tuning_parameter_fn(integrator, step_size, max_num_steps, path_fraction),
            _apply_fn(integrator, step_size, max_num_steps, path_fraction),
            inverse_mass_matrix,
            divergence_threshold,
        )
        return new_state, GISTTrajectoryLengthInfo(
            info.momentum,
            info.tuning_parameter,
            info.is_accepted,
            info.is_divergent,
            info.acceptance_rate,
            info.energy,
            info.num_integration_steps,
            extra.num_steps_to_uturn_forward,
            extra.num_steps_to_uturn_reverse,
            extra.is_no_return_rejected,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    inverse_mass_matrix: metrics.MetricTypes,
    step_size: float,
    *,
    path_fraction: float = 0.5,
    max_num_steps: int = 1024,
    divergence_threshold: float = 1000,
    integrator: Callable = integrators.velocity_verlet,
) -> SamplingAlgorithm:
    """``blackjax_tpu.gist_trajectory_length(...)``."""
    kernel = build_kernel(integrator, divergence_threshold, path_fraction, max_num_steps)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, inverse_mass_matrix),
    )
