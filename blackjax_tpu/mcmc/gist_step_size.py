"""GIST with a self-tuned step size (autoStep/autoMALA-style doubling/
halving selection with a reversibility check).

Behavioral parity target: ``blackjax/mcmc/gist_step_size.py``
(``step_size_selector`` :142, MH correction via the reversibility-check
indicator ratio). The tuning parameter is ``alpha = (a, b, j)``: soft
acceptance thresholds drawn uniformly on the triangle ``a < b``, plus the
log2 step-size index selected by the search.
"""
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import gist, hmc, integrators, metrics, trajectory
from blackjax_tpu.mcmc.integrators import IntegratorState
from blackjax_tpu.mcmc.proposal import safe_energy_diff
from blackjax_tpu.types import Array, PRNGKey

__all__ = [
    "GISTStepSizeInfo",
    "StepSizeTuningParameter",
    "init",
    "step_size_selector",
    "build_kernel",
    "as_top_level_api",
]

init = gist.init


class StepSizeTuningParameter(NamedTuple):
    """``alpha = (a, b, j)``: thresholds uniform on the triangle ``a < b``
    (their density cancels since g = identity) and the selected log2 step
    index, ``step_size = initial_step_size * 2**j``."""

    a: Array
    b: Array
    step_index: Array


class _StepSizeExtra(NamedTuple):
    num_integration_steps: Array
    reverse_step_index: Array
    search_exhausted: Array
    step_size: Array


class GISTStepSizeInfo(NamedTuple):
    """GISTInfo fields plus the forward/reverse step indices (rejection due
    to ``reverse != forward`` is folded into ``is_accepted``), the
    search-budget-exhausted flag, and the realized step size."""

    momentum: Array
    tuning_parameter: StepSizeTuningParameter
    is_accepted: Array
    is_divergent: Array
    acceptance_rate: Array
    energy: float
    num_integration_steps: Array
    step_index: Array
    reverse_step_index: Array
    search_exhausted: Array
    step_size: Array


def step_size_selector(
    integrator: Callable,
    num_integration_steps: int,
    initial_step_size: float,
    max_search_steps: int = 10,
    criterion: str = "symmetric",
) -> Callable:
    """Build ``mu(state, a, b, logdensity_fn, metric) -> (step_index,
    search_exhausted)``: double (or halve) the step size until the trial
    trajectory's log-acceptance crosses the ``(log a, log b)`` band.
    ``"symmetric"`` uses the AutoStep Algorithm-2 |ell| band (proven
    irreducible/aperiodic); ``"asymmetric"`` is autoMALA's original."""
    if criterion not in ("symmetric", "asymmetric"):
        raise ValueError(f"criterion must be 'symmetric' or 'asymmetric', got {criterion!r}")
    is_symmetric = criterion == "symmetric"

    def mu(
        state: IntegratorState,
        a,
        b,
        logdensity_fn,
        metric,
        *,
        build_trajectory: Optional[Callable] = None,
    ):
        # build the trajectory function once per mu call (apply_fn shares
        # its own so the reverse re-check doesn't re-wrap logdensity_fn)
        if build_trajectory is None:
            symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
            build_trajectory = trajectory.static_integration(symplectic_integrator)

        def log_acceptance_ratio(step_size):
            end_state = build_trajectory(state, step_size, num_integration_steps)
            end_state = hmc.flip_momentum(end_state)
            initial_energy = -state.logdensity + metric.kinetic_energy(state.momentum)
            new_energy = -end_state.logdensity + metric.kinetic_energy(end_state.momentum)
            return safe_energy_diff(initial_energy, new_energy)

        log_a, log_b = jnp.log(a), jnp.log(b)

        # iteration 0 decides the direction v from ell at the current j;
        # folding it into the same while_loop keeps logdensity_fn at one
        # trace site
        def cond_fn(carry):
            _, n, terminated, _ = carry
            return ~terminated & (n < max_search_steps + 1)

        def body_fn(carry):
            j, n, _, v = carry
            is_deciding = n == 0
            trial_j = jnp.where(is_deciding, j, j + v)
            step_size = initial_step_size * 2.0 ** trial_j.astype(jnp.float32)
            ell = log_acceptance_ratio(step_size)

            if is_symmetric:
                do_expand = jnp.abs(ell) < jnp.abs(log_b)
                do_shrink = jnp.abs(ell) > jnp.abs(log_a)
            else:
                do_expand = ell >= log_b
                do_shrink = ell <= log_a
            v_decided = jnp.where(do_expand, 1, jnp.where(do_shrink, -1, 0)).astype(
                jnp.int32
            )
            v_next = jnp.where(is_deciding, v_decided, v)

            if is_symmetric:
                term_expand = (v_next == 1) & (jnp.abs(ell) >= jnp.abs(log_b))
                term_shrink = (v_next == -1) & (jnp.abs(ell) <= jnp.abs(log_a))
            else:
                term_expand = (v_next == 1) & (ell < log_b)
                term_shrink = (v_next == -1) & (ell > log_a)
            terminated_next = jnp.where(
                is_deciding, v_next == 0, term_expand | term_shrink
            )
            return trial_j, n + 1, terminated_next, v_next

        init_carry = (
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(0, jnp.int32),
        )
        j_final, _, terminated_final, v_final = jax.lax.while_loop(
            cond_fn, body_fn, init_carry
        )
        search_exhausted = ~terminated_final & (v_final != 0)
        # final halving: a successful expansion reports one index back so
        # the reversibility check can pass in the doubling sub-case
        step_index = jnp.where(terminated_final & (v_final == 1), j_final - 1, j_final)
        return step_index, search_exhausted

    return mu


def _tuning_parameter_fn(selector: Callable) -> Callable:
    def tuning_parameter_fn(rng_key, state, logdensity_fn, metric):
        u = jax.random.uniform(rng_key, shape=(2,))
        a, b = jnp.minimum(u[0], u[1]), jnp.maximum(u[0], u[1])
        step_index, search_exhausted = selector(state, a, b, logdensity_fn, metric)
        return StepSizeTuningParameter(a, b, step_index), search_exhausted

    return tuning_parameter_fn


def _apply_fn(
    integrator: Callable,
    num_integration_steps: int,
    initial_step_size: float,
    selector: Callable,
) -> Callable:
    def apply_fn(state, alpha, aux, logdensity_fn, metric):
        a, b, step_index = alpha
        forward_exhausted = aux
        step_size = initial_step_size * 2.0 ** step_index.astype(jnp.float32)

        symplectic_integrator = integrator(logdensity_fn, metric.kinetic_energy)
        build_trajectory = trajectory.static_integration(symplectic_integrator)
        proposal_state = hmc.flip_momentum(
            build_trajectory(state, step_size, num_integration_steps)
        )

        reverse_step_index, reverse_exhausted = selector(
            proposal_state, a, b, logdensity_fn, metric, build_trajectory=build_trajectory
        )
        search_exhausted = forward_exhausted | reverse_exhausted
        is_reversible = reverse_step_index == step_index
        log_tuning_density_ratio = jnp.where(
            is_reversible & ~search_exhausted, 0.0, -jnp.inf
        )
        extra = _StepSizeExtra(
            jnp.asarray(num_integration_steps),
            reverse_step_index,
            search_exhausted,
            step_size,
        )
        return proposal_state, log_tuning_density_ratio, extra

    return apply_fn


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    criterion: str = "symmetric",
    max_search_steps: int = 10,
) -> Callable:
    """``gist_step_size`` kernel."""
    if criterion not in ("symmetric", "asymmetric"):
        raise ValueError(f"criterion must be 'symmetric' or 'asymmetric', got {criterion!r}")

    def kernel(
        rng_key: PRNGKey,
        state: gist.GISTState,
        logdensity_fn: Callable,
        initial_step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        num_integration_steps: int = 1,
    ) -> tuple[gist.GISTState, GISTStepSizeInfo]:
        selector = step_size_selector(
            integrator, num_integration_steps, initial_step_size, max_search_steps, criterion
        )
        new_state, info, extra = gist._step(
            rng_key,
            state,
            logdensity_fn,
            _tuning_parameter_fn(selector),
            _apply_fn(integrator, num_integration_steps, initial_step_size, selector),
            inverse_mass_matrix,
            divergence_threshold,
        )
        tuning_parameter = info.tuning_parameter
        return new_state, GISTStepSizeInfo(
            info.momentum,
            tuning_parameter,
            info.is_accepted,
            info.is_divergent,
            info.acceptance_rate,
            info.energy,
            info.num_integration_steps,
            tuning_parameter.step_index,
            extra.reverse_step_index,
            extra.search_exhausted,
            extra.step_size,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable,
    inverse_mass_matrix: metrics.MetricTypes,
    initial_step_size: float,
    num_integration_steps: int = 1,
    *,
    criterion: str = "symmetric",
    max_search_steps: int = 10,
    divergence_threshold: float = 1000,
    integrator: Callable = integrators.velocity_verlet,
) -> SamplingAlgorithm:
    """``blackjax_tpu.gist_step_size(...)``: per-transition random step-size
    selection with MH correction."""
    kernel = build_kernel(integrator, divergence_threshold, criterion, max_search_steps)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(initial_step_size, inverse_mass_matrix, num_integration_steps),
    )
