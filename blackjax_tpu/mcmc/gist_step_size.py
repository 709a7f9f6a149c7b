"""GIST instance: self-tuned step size (autoStep / autoMALA family).

The tuning parameter is ``alpha = (a, b, j)``: two acceptance thresholds
drawn uniformly on the triangle ``a < b`` (their density is symmetric under
the involution, so it cancels) and the log2 step-size index ``j`` picked by
a doubling/halving search — double while the trial trajectory's
log-acceptance says the step is too small, halve while too large, stop when
it enters the ``(log a, log b)`` band.  Detailed balance needs the search
re-run from the proposal to land on the same index (the "reversibility
check"); a mismatch or an exhausted search budget forces rejection through
a ``-inf`` tuning log-ratio.

Search formulation used here: each trial classifies the log-acceptance into
a *band code* (+1 step too small / 0 in band / -1 too large).  The first
trial's code fixes the search direction; the walk stops as soon as a trial's
code disagrees with that direction.  One `while_loop`, one
``logdensity_fn`` call site (trace count stays at 3 per kernel call).

Behavioral parity: ``blackjax/mcmc/gist_step_size.py`` (selector :142, MH
correction via the indicator ratio).
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

_CRITERIA = ("symmetric", "asymmetric")


class StepSizeTuningParameter(NamedTuple):
    """``alpha = (a, b, j)`` with ``step_size = initial_step_size * 2**j``."""

    a: Array
    b: Array
    step_index: Array


class _StepSizeExtra(NamedTuple):
    num_integration_steps: Array
    reverse_step_index: Array
    search_exhausted: Array
    step_size: Array


class GISTStepSizeInfo(NamedTuple):
    """GISTInfo fields plus the forward/reverse step indices (a
    ``reverse != forward`` mismatch is folded into ``is_accepted``), the
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


class _Search(NamedTuple):
    index: Array  # j of the most recent trial
    tick: Array  # number of trials so far
    direction: Array  # +1 double / -1 halve / 0 undecided-or-in-band
    done: Array


def step_size_selector(
    integrator: Callable, num_integration_steps: int,
    initial_step_size: float, max_search_steps: int = 10,
    criterion: str = "symmetric",
) -> Callable:
    """Build ``mu(state, a, b, logdensity_fn, metric) -> (step_index,
    search_exhausted)``.

    ``"symmetric"`` is AutoStep Algorithm 2's |ell| band (proven
    irreducible/aperiodic); ``"asymmetric"`` is autoMALA's original signed
    band, kept for cross-validation.
    """
    if criterion not in _CRITERIA:
        raise ValueError(
            f"criterion must be 'symmetric' or 'asymmetric', got {criterion!r}"
        )
    symmetric = criterion == "symmetric"

    def mu(
        state: IntegratorState, a, b, logdensity_fn, metric, *,
        build_trajectory: Optional[Callable] = None,
    ):
        # One trajectory builder per mu call; apply_fn hands over its own so
        # the reverse re-check never re-wraps logdensity_fn a second time.
        if build_trajectory is None:
            one_step = integrator(logdensity_fn, metric.kinetic_energy)
            build_trajectory = trajectory.static_integration(one_step)
        energy_at_start = -state.logdensity + metric.kinetic_energy(state.momentum)
        log_a, log_b = jnp.log(a), jnp.log(b)

        def trial_log_accept(j):
            """ell(theta, rho, eps * 2**j) for one trial trajectory."""
            eps = initial_step_size * 2.0 ** j.astype(jnp.float32)
            end = hmc.flip_momentum(
                build_trajectory(state, eps, num_integration_steps)
            )
            energy_at_end = -end.logdensity + metric.kinetic_energy(end.momentum)
            return safe_energy_diff(energy_at_start, energy_at_end)

        def band_code(ell):
            """+1 when the step is too small (expand), -1 too large
            (shrink), 0 inside the acceptance band."""
            if symmetric:
                too_small = jnp.abs(ell) < jnp.abs(log_b)
                too_large = jnp.abs(ell) > jnp.abs(log_a)
            else:
                too_small = ell >= log_b
                too_large = ell <= log_a
            codes = jnp.where(too_small, 1, jnp.where(too_large, -1, 0))
            return codes.astype(jnp.int32)

        # Trial 0 evaluates at j=0 (direction still 0) and fixes the
        # direction from its band code; every later trial walks one index in
        # that direction and stops as soon as its code disagrees with it.
        # This keeps trial_log_accept — hence logdensity_fn — at a single
        # trace-time call site (while_loop bodies trace once).
        def walk(search: _Search) -> _Search:
            j = search.index + search.direction
            code = band_code(trial_log_accept(j))
            direction = jnp.where(search.tick == 0, code, search.direction)
            return _Search(
                j, search.tick + 1, direction, (direction == 0) | (code != direction)
            )

        start = _Search(
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
        )
        end = jax.lax.while_loop(
            lambda s: ~s.done & (s.tick <= max_search_steps), walk, start
        )
        search_exhausted = ~end.done & (end.direction != 0)
        # A successful doubling run reports one index back — the last trial
        # overshot the band, and without the step-back the reverse search
        # could never reproduce the forward index.
        step_index = jnp.where(
            end.done & (end.direction == 1), end.index - 1, end.index
        )
        return step_index, search_exhausted

    return mu


def _gibbs_draw(selector: Callable) -> Callable:
    """Draw (a, b) on the triangle and run the forward search."""

    def tuning_parameter_fn(rng_key, state, logdensity_fn, metric):
        u = jax.random.uniform(rng_key, shape=(2,))
        a, b = jnp.minimum(u[0], u[1]), jnp.maximum(u[0], u[1])
        step_index, search_exhausted = selector(state, a, b, logdensity_fn, metric)
        return StepSizeTuningParameter(a, b, step_index), search_exhausted

    return tuning_parameter_fn


def _involution(
    integrator: Callable, num_integration_steps: int,
    initial_step_size: float, selector: Callable,
) -> Callable:
    """Integrate at the selected step size, then re-run the search from the
    proposal; the tuning log-ratio is the reversibility indicator."""

    def apply_fn(state, alpha, aux, logdensity_fn, metric):
        step_size = initial_step_size * 2.0 ** alpha.step_index.astype(jnp.float32)
        one_step = integrator(logdensity_fn, metric.kinetic_energy)
        build_trajectory = trajectory.static_integration(one_step)
        proposal = hmc.flip_momentum(
            build_trajectory(state, step_size, num_integration_steps)
        )
        reverse_index, reverse_exhausted = selector(
            proposal, alpha.a, alpha.b, logdensity_fn, metric,
            build_trajectory=build_trajectory,
        )
        exhausted = aux | reverse_exhausted
        reversible = reverse_index == alpha.step_index
        log_ratio = jnp.where(reversible & ~exhausted, 0.0, -jnp.inf)
        extra = _StepSizeExtra(
            jnp.asarray(num_integration_steps), reverse_index, exhausted, step_size
        )
        return proposal, log_ratio, extra

    return apply_fn


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    criterion: str = "symmetric",
    max_search_steps: int = 10,
) -> Callable:
    """``gist_step_size`` kernel."""
    if criterion not in _CRITERIA:
        raise ValueError(
            f"criterion must be 'symmetric' or 'asymmetric', got {criterion!r}"
        )
    transition = gist.build_transition(divergence_threshold)

    def kernel(
        rng_key: PRNGKey, state: gist.GISTState, logdensity_fn: Callable,
        initial_step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        num_integration_steps: int = 1,
    ) -> tuple[gist.GISTState, GISTStepSizeInfo]:
        selector = step_size_selector(
            integrator, num_integration_steps, initial_step_size,
            max_search_steps, criterion,
        )
        new_state, info, extra = transition(
            rng_key, state, logdensity_fn, _gibbs_draw(selector),
            _involution(integrator, num_integration_steps, initial_step_size,
                        selector),
            inverse_mass_matrix,
        )
        return new_state, GISTStepSizeInfo(
            *info,
            info.tuning_parameter.step_index,
            extra.reverse_step_index,
            extra.search_exhausted,
            extra.step_size,
        )

    return kernel


def as_top_level_api(
    logdensity_fn: Callable, inverse_mass_matrix: metrics.MetricTypes,
    initial_step_size: float, num_integration_steps: int = 1, *,
    criterion: str = "symmetric", max_search_steps: int = 10,
    divergence_threshold: float = 1000,
    integrator: Callable = integrators.velocity_verlet,
) -> SamplingAlgorithm:
    """``blackjax_tpu.gist_step_size(...)``: per-transition self-tuned step
    size with MH correction."""
    kernel = build_kernel(integrator, divergence_threshold, criterion, max_search_steps)
    return build_sampling_algorithm(
        kernel, init, logdensity_fn,
        kernel_args=(initial_step_size, inverse_mass_matrix,
                     num_integration_steps),
    )
