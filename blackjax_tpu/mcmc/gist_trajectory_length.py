"""GIST instance: self-tuned trajectory length from the U-turn path.

The tuning parameter is the leapfrog step count, drawn uniformly from the
tail ``[floor(psi * U), U]`` of the forward U-turn path — a *linear*
one-step-at-a-time rollout to the first U-turn (Bou-Rabee et al. §2.2), not
NUTS doubling.  Detailed balance compares the forward draw interval against
the interval the reverse rollout (from the momentum-flipped proposal) would
have offered: a draw outside the reverse interval is a "no-return"
rejection (``-inf`` tuning log-ratio); otherwise the ratio of the two
interval widths enters the acceptance exponent.

Behavioral parity: ``blackjax/mcmc/gist_trajectory_length.py``
(``num_steps_to_uturn`` :103, interval draw :178-186).
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
    """``U(theta, rho)``: leapfrog one step at a time until the
    displacement-velocity inner product ``<theta_n - theta_0, M^-1 rho_n>``
    goes negative; capped at ``max_num_steps`` (a capped U is still a valid
    conditional, just a different one)."""
    velocity_fn = jax.grad(metric.kinetic_energy)

    def uturn_fn(state: IntegratorState, logdensity_fn: Callable) -> Array:
        one_step = integrator(logdensity_fn, metric.kinetic_energy)
        origin, _ = ravel_pytree(state.position)

        def still_outbound(carry):
            count, _, turned = carry
            return ~turned & (count < max_num_steps)

        def roll(carry):
            count, here, _ = carry
            there = one_step(here, step_size)
            displacement = ravel_pytree(there.position)[0] - origin
            velocity, _ = ravel_pytree(velocity_fn(there.momentum, there.position))
            return count + 1, there, displacement @ velocity < 0.0

        steps, _, _ = jax.lax.while_loop(
            still_outbound, roll, (jnp.asarray(0), state, jnp.asarray(False))
        )
        return steps

    return uturn_fn


def _draw_interval(uturn_steps: Array, path_fraction: float):
    """``([Lo, U], width)`` of the uniform step-count draw (eqs. 34-35)."""
    lo = jnp.maximum(1, jnp.floor(path_fraction * uturn_steps).astype(jnp.int32))
    width = uturn_steps - lo + 1
    return lo, width


def _gibbs_draw(integrator, step_size, max_num_steps, path_fraction):
    def tuning_parameter_fn(rng_key, state, logdensity_fn, metric):
        uturn_fn = num_steps_to_uturn(integrator, step_size, metric, max_num_steps)
        forward = uturn_fn(state, logdensity_fn)
        lo, _ = _draw_interval(forward, path_fraction)
        num_steps = jax.random.randint(rng_key, (), minval=lo, maxval=forward + 1)
        return num_steps, forward

    return tuning_parameter_fn


def _involution(integrator, step_size, max_num_steps, path_fraction):
    def apply_fn(state, alpha, aux, logdensity_fn, metric):
        num_steps, forward = alpha, aux
        one_step = integrator(logdensity_fn, metric.kinetic_energy)
        roll_forward = trajectory.static_integration(one_step)
        proposal = hmc.flip_momentum(roll_forward(state, step_size, num_steps))

        uturn_fn = num_steps_to_uturn(integrator, step_size, metric, max_num_steps)
        reverse = uturn_fn(proposal, logdensity_fn)

        _, forward_width = _draw_interval(forward, path_fraction)
        reverse_lo, reverse_width = _draw_interval(reverse, path_fraction)
        returnable = (num_steps >= reverse_lo) & (num_steps <= reverse)
        width_ratio = jnp.log(forward_width.astype(jnp.float32)) - jnp.log(
            reverse_width.astype(jnp.float32)
        )
        log_ratio = jnp.where(returnable, width_ratio, -jnp.inf)
        extra = _TrajectoryLengthExtra(num_steps, forward, reverse, ~returnable)
        return proposal, log_ratio, extra

    return apply_fn


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    path_fraction: float = 0.5,
    max_num_steps: int = 1024,
) -> Callable:
    """``gist_trajectory_length`` kernel (``path_fraction`` = psi; 0.5 per
    the paper's recommendation)."""
    transition = gist.build_transition(divergence_threshold)

    def kernel(
        rng_key: PRNGKey, state: gist.GISTState, logdensity_fn: Callable,
        step_size: float, inverse_mass_matrix: metrics.MetricTypes,
    ) -> tuple[gist.GISTState, GISTTrajectoryLengthInfo]:
        new_state, info, extra = transition(
            rng_key, state, logdensity_fn,
            _gibbs_draw(integrator, step_size, max_num_steps, path_fraction),
            _involution(integrator, step_size, max_num_steps, path_fraction),
            inverse_mass_matrix,
        )
        return new_state, GISTTrajectoryLengthInfo(
            *info,
            extra.num_steps_to_uturn_forward,
            extra.num_steps_to_uturn_reverse,
            extra.is_no_return_rejected,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable, inverse_mass_matrix: metrics.MetricTypes,
    step_size: float, *, path_fraction: float = 0.5,
    max_num_steps: int = 1024, divergence_threshold: float = 1000,
    integrator: Callable = integrators.velocity_verlet,
) -> SamplingAlgorithm:
    """``blackjax_tpu.gist_trajectory_length(...)``."""
    kernel = build_kernel(integrator, divergence_threshold, path_fraction, max_num_steps)
    return build_sampling_algorithm(
        kernel, init, logdensity_fn,
        kernel_args=(step_size, inverse_mass_matrix),
    )
