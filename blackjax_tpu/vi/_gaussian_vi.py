"""Shared optimization engine for the Gaussian variational families
(mean-field and full-rank).

Behavioral parity target: ``blackjax/vi/_gaussian_vi.py`` (KL :27 and
Rényi-alpha :34 objectives, shared reparameterized step).
"""
from dataclasses import dataclass
from typing import Callable, Union

import jax
import jax.numpy as jnp
import jax.scipy as jsp
from optax import GradientTransformation, OptState

__all__ = ["KL", "RenyiAlpha", "Objective", "elbo_step"]


@dataclass(frozen=True)
class KL:
    """Reverse KL(q || p) — the standard negative-ELBO objective."""


@dataclass(frozen=True)
class RenyiAlpha:
    """Rényi-alpha variational bound; reduces to reverse KL at alpha = 1."""

    alpha: float


Objective = Union[KL, RenyiAlpha]


def _loss_from_log_ratio(log_ratio: jax.Array, objective: Objective) -> jax.Array:
    if isinstance(objective, KL):
        return jnp.mean(log_ratio)
    if isinstance(objective, RenyiAlpha):
        alpha = objective.alpha
        if alpha == 1.0:
            return jnp.mean(log_ratio)
        scaled = (alpha - 1.0) * log_ratio
        return (jsp.special.logsumexp(scaled) - jnp.log(log_ratio.shape[0])) / (
            alpha - 1.0
        )
    raise TypeError(f"Unsupported objective type: {type(objective)!r}")


def elbo_step(
    rng_key,
    parameters: tuple,
    opt_state: OptState,
    logdensity_fn: Callable,
    optimizer: GradientTransformation,
    sample_fn: Callable,
    logq_fn: Callable,
    num_samples: int,
    objective: Objective = KL(),
    stl_estimator: bool = True,
) -> tuple[tuple, OptState, float]:
    """One Monte-Carlo reparameterization-gradient step of the variational
    objective. With ``stl_estimator`` the score term is dropped by
    stop-gradient on the parameters inside ``logq`` (sticking the landing)."""
    if stl_estimator and isinstance(objective, RenyiAlpha) and objective.alpha != 1.0:
        raise ValueError(
            "stl_estimator only applies to KL() / RenyiAlpha(alpha=1.0); pass "
            "stl_estimator=False for other alpha."
        )

    def loss_fn(parameters):
        z = sample_fn(rng_key, parameters, num_samples)
        logq_parameters = (
            jax.lax.stop_gradient(parameters) if stl_estimator else parameters
        )
        logq = jax.vmap(logq_fn(logq_parameters))(z)
        logp = jax.vmap(logdensity_fn)(z)
        return _loss_from_log_ratio(logq - logp, objective)

    loss, grads = jax.value_and_grad(loss_fn)(parameters)
    updates, new_opt_state = optimizer.update(grads, opt_state, parameters)
    new_parameters = jax.tree.map(lambda p, u: p + u, parameters, updates)
    return new_parameters, new_opt_state, loss
