"""Step-size adaptation: dual averaging on the acceptance-rate error, the
doubling/halving search for a reasonable first step size, and the bracketing
bisection controller used by LAPS.

Behavioral parity target: ``blackjax/adaptation/step_size.py`` (DA wrapper
:65, reasonable-step-size search :180, bisection :262).
"""
import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.optimizers.dual_averaging import DualAveragingState, dual_averaging
from blackjax_tpu.types import PRNGKey

__all__ = [
    "DualAveragingAdaptationState",
    "dual_averaging_adaptation",
    "find_reasonable_step_size",
    "bisection_monotonic_fn",
]


class DualAveragingAdaptationState(NamedTuple):
    log_step_size: float
    log_step_size_avg: float
    step: int
    avg_error: float
    mu: float


def dual_averaging_adaptation(
    target: float, t0: int = 10, gamma: float = 0.05, kappa: float = 0.75
) -> tuple[Callable, Callable, Callable]:
    """Tune the step size so the observed acceptance rate converges to
    ``target``: DA on the error signal ``target - acceptance_rate``."""
    da_init, da_update, da_final = dual_averaging(t0, gamma, kappa)

    def init(initial_step_size: float) -> DualAveragingAdaptationState:
        return DualAveragingAdaptationState(*da_init(initial_step_size))

    def update(
        state: DualAveragingAdaptationState, acceptance_rate: float
    ) -> DualAveragingAdaptationState:
        return DualAveragingAdaptationState(
            *da_update(DualAveragingState(*state), target - acceptance_rate)
        )

    def final(state: DualAveragingAdaptationState) -> float:
        return jnp.exp(state.log_step_size_avg)

    return init, update, final


class ReasonableStepSizeState(NamedTuple):
    step: int
    direction: int
    previous_direction: int
    step_size: float


def find_reasonable_step_size(
    rng_key: PRNGKey,
    kernel_generator: Callable[[float], Callable],
    reference_state,
    initial_step_size: float,
    target_accept: float = 0.65,
) -> float:
    """Double/halve the step size until the kernel's acceptance rate crosses
    ``target_accept``, starting fresh from ``reference_state`` each probe
    (never advances the chain)."""
    fp = jnp.finfo(jax.lax.dtype(initial_step_size))

    def keep_searching(state: ReasonableStepSizeState):
        _, direction, previous_direction, step_size = state
        not_too_large = (step_size < fp.max) | (direction <= 0)
        not_too_small = (step_size > fp.tiny) | (direction >= 0)
        not_crossed = (previous_direction == 0) | (direction == previous_direction)
        return not_too_large & not_too_small & not_crossed

    def probe(state: ReasonableStepSizeState):
        i, direction, _, step_size = state
        step_size = (2.0**direction) * step_size
        kernel = kernel_generator(step_size)
        _, info = kernel(jax.random.fold_in(rng_key, i), reference_state)
        new_direction = jnp.where(target_accept < info.acceptance_rate, 1, -1)
        return ReasonableStepSizeState(i + 1, new_direction, direction, step_size)

    state = ReasonableStepSizeState(0, 0, 0, initial_step_size)
    state = jax.lax.while_loop(keep_searching, probe, state)
    return state.step_size


def bisection_monotonic_fn(acc_prob_wanted, reduce_shift=math.log(2.0), tolerance=0.03):
    """Bracketing bisection on log step size against a monotonically
    decreasing acceptance-rate response; no initial bracketing interval
    needed. Returns ``update((bounds, terminated), step_size, acc_rate) ->
    ((bounds, terminated), new_step_size)``."""

    def update(state, current_step_size, acc_rate):
        bounds, terminated = state
        x = jnp.log(current_step_size)
        acc_high = acc_rate > acc_prob_wanted

        lower = jnp.where(acc_high, jnp.maximum(bounds[0], x), bounds[0])
        upper = jnp.where(acc_high, bounds[1], jnp.minimum(bounds[1], x))
        new_bounds = jnp.array([lower, upper])
        probe = jnp.where(acc_high, lower + reduce_shift, upper - reduce_shift)

        bracketing = jnp.all(jnp.isfinite(new_bounds))
        x_new = jnp.where(bracketing, jnp.mean(new_bounds), probe)

        step_size = jnp.where(terminated, current_step_size, jnp.exp(x_new))
        new_terminated = (jnp.abs(acc_rate - acc_prob_wanted) < tolerance) | terminated
        return (new_bounds, new_terminated), step_size

    return update
