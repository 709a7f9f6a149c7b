"""Bisection root solver for the adaptive-tempering ESS equation.

Behavioral parity target: ``blackjax/smc/solver.py:24``.
"""
from typing import Callable, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.types import Array

__all__ = ["dichotomy"]


def dichotomy(
    fun: Callable,
    min_delta: Union[float, Array],
    max_delta: Union[float, Array],
    eps: float = 1e-4,
    max_iter: int = 100,
) -> Array:
    """Root of a decreasing ``fun`` on ``[min_delta, max_delta]`` by
    bisection. If ``fun(max_delta) > 0`` the whole interval is feasible and
    ``max_delta`` is returned; if ``fun(min_delta) <= 0`` there is no root
    and NaN is returned."""

    def cond(carry):
        i, a, b, f_a, f_b = carry
        return (i < max_iter) & (f_a - f_b > eps)

    def body(carry):
        i, a, b, f_a, f_b = carry
        mid = 0.5 * (a + b)
        f_mid = fun(mid)
        go_left = f_mid < 0
        a = jnp.where(go_left, a, mid)
        f_a = jnp.where(go_left, f_a, f_mid)
        b = jnp.where(go_left, mid, b)
        f_b = jnp.where(go_left, f_mid, f_b)
        return i + 1, a, b, f_a, f_b

    f_min, f_max = fun(min_delta), fun(max_delta)

    def bisect():
        _, a, _, _, _ = jax.lax.while_loop(
            cond, body, (0, min_delta + 0.0, max_delta + 0.0, f_min, f_max)
        )
        return a

    return jax.lax.cond(
        f_max > 0,
        lambda: max_delta + 0.0,
        lambda: jax.lax.cond(
            f_min > 0, bisect, lambda: jnp.nan + 0.0 * f_min
        ),
    )
