"""Mean-field (diagonal Gaussian) ADVI.

Behavioral parity target: ``blackjax/vi/meanfield_vi.py`` (state :37,
reparameterized step :73, sampling :136).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from optax import GradientTransformation, OptState

from blackjax_tpu.base import VIAlgorithm
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.vi._gaussian_vi import KL, Objective, elbo_step

__all__ = ["MFVIState", "MFVIInfo", "init", "step", "sample", "as_top_level_api"]


class MFVIState(NamedTuple):
    mu: ArrayTree
    rho: ArrayTree  # log standard deviations
    opt_state: OptState


class MFVIInfo(NamedTuple):
    elbo: float


def init(
    position: ArrayLikeTree,
    optimizer: GradientTransformation,
    *optimizer_args,
    **optimizer_kwargs,
) -> MFVIState:
    """Zero mean, log-scale -2 (sd ≈ 0.135) initialization."""
    mu = jax.tree.map(jnp.zeros_like, position)
    rho = jax.tree.map(lambda x: jnp.full_like(x, -2.0), position)
    return MFVIState(mu, rho, optimizer.init((mu, rho)))


def _sample(rng_key, mu, rho, num_samples):
    """Reparameterized draws: ``mu + exp(rho) * eps`` in the flat basis."""
    mu_flat, unravel = ravel_pytree(mu)
    log_sd_flat, _ = ravel_pytree(rho)
    white = jax.random.normal(rng_key, (num_samples, mu_flat.shape[0]))
    return jax.vmap(unravel)(mu_flat + jnp.exp(log_sd_flat) * white)


def generate_meanfield_logdensity(mu, rho):
    """Closed-form diagonal-Gaussian log-density in the flat basis."""
    mu_flat, _ = ravel_pytree(mu)
    log_sd_flat, _ = ravel_pytree(rho)
    norm_const = -jnp.sum(log_sd_flat) - 0.5 * mu_flat.shape[0] * jnp.log(
        2.0 * jnp.pi
    )

    def logdensity(position):
        standardized = (ravel_pytree(position)[0] - mu_flat) * jnp.exp(-log_sd_flat)
        return norm_const - 0.5 * jnp.sum(jnp.square(standardized))

    return logdensity


def step(
    rng_key: PRNGKey,
    state: MFVIState,
    logdensity_fn: Callable,
    optimizer: GradientTransformation,
    num_samples: int = 5,
    objective: Objective = KL(),
    stl_estimator: bool = True,
) -> tuple[MFVIState, MFVIInfo]:
    """One reparameterized-gradient update of (mu, rho)."""
    parameters = (state.mu, state.rho)
    new_parameters, new_opt_state, loss = elbo_step(
        rng_key,
        parameters,
        state.opt_state,
        logdensity_fn,
        optimizer,
        lambda key, params, n: _sample(key, params[0], params[1], n),
        lambda params: generate_meanfield_logdensity(params[0], params[1]),
        num_samples,
        objective=objective,
        stl_estimator=stl_estimator,
    )
    return MFVIState(new_parameters[0], new_parameters[1], new_opt_state), MFVIInfo(loss)


def sample(rng_key: PRNGKey, state: MFVIState, num_samples: int = 1):
    return _sample(rng_key, state.mu, state.rho, num_samples)


def as_top_level_api(
    logdensity_fn: Callable,
    optimizer: GradientTransformation,
    num_samples: int = 100,
    objective: Objective = KL(),
    stl_estimator: bool = True,
) -> VIAlgorithm:
    """``blackjax_tpu.meanfield_vi(...)``."""

    def init_fn(position):
        return init(position, optimizer)

    def step_fn(rng_key, state):
        return step(
            rng_key,
            state,
            logdensity_fn,
            optimizer,
            num_samples,
            objective=objective,
            stl_estimator=stl_estimator,
        )

    def sample_fn(rng_key, state, num_samples):
        return sample(rng_key, state, num_samples)

    return VIAlgorithm(init_fn, step_fn, sample_fn)
