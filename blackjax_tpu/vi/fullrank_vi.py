"""Full-rank Gaussian ADVI with Cholesky parameterization.

Behavioral parity target: ``blackjax/vi/fullrank_vi.py`` (Cholesky
unflattening :225, direct-from-factor log density :292).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import jax.scipy as jsp
from jax.flatten_util import ravel_pytree
from optax import GradientTransformation, OptState

from blackjax_tpu.base import VIAlgorithm
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.vi._gaussian_vi import KL, Objective, elbo_step

__all__ = ["FRVIState", "FRVIInfo", "init", "step", "sample", "as_top_level_api"]


class FRVIState(NamedTuple):
    mu: ArrayTree
    chol_params: Array  # (d + d(d-1)/2,): log-diag then strict lower triangle
    opt_state: OptState


class FRVIInfo(NamedTuple):
    elbo: float


def init(
    position: ArrayLikeTree,
    optimizer: GradientTransformation,
    *optimizer_args,
    **optimizer_kwargs,
) -> FRVIState:
    """Zero mean, identity covariance (log-diag zeros)."""
    mu = jax.tree.map(jnp.zeros_like, position)
    dim = ravel_pytree(mu)[0].shape[0]
    chol_params = jnp.zeros(dim * (dim + 1) // 2)
    return FRVIState(mu, chol_params, optimizer.init((mu, chol_params)))


def _unflatten_cholesky(chol_params, dim):
    """Lower-triangular factor with exp-positive diagonal: the first ``dim``
    entries are log-diagonal, the rest fill the strict lower triangle. This
    keeps the covariance SPD under unconstrained optimization."""
    L = jnp.zeros((dim, dim)).at[jnp.tril_indices(dim, k=-1)].set(chol_params[dim:])
    return L + jnp.diag(jnp.exp(chol_params[:dim]))


def _sample(rng_key, mu, chol_params, num_samples):
    mu_flat, unravel = ravel_pytree(mu)
    dim = mu_flat.size
    L = _unflatten_cholesky(chol_params, dim)
    eps = jax.random.normal(rng_key, (num_samples, dim))
    return jax.vmap(unravel)(mu_flat + eps @ L.T)


def generate_fullrank_logdensity(mu, chol_params):
    """Log density straight from the Cholesky factor (no refactorization)."""
    mu_flat, _ = ravel_pytree(mu)
    dim = mu_flat.size
    L = _unflatten_cholesky(chol_params, dim)
    log_det = 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    const = -0.5 * dim * jnp.log(2.0 * jnp.pi)

    def logdensity(position):
        x, _ = ravel_pytree(position)
        y = jsp.linalg.solve_triangular(L, x - mu_flat, lower=True)
        return const - 0.5 * (log_det + jnp.sum(y**2))

    return logdensity


def step(
    rng_key: PRNGKey,
    state: FRVIState,
    logdensity_fn: Callable,
    optimizer: GradientTransformation,
    num_samples: int = 5,
    objective: Objective = KL(),
    stl_estimator: bool = True,
) -> tuple[FRVIState, FRVIInfo]:
    parameters = (state.mu, state.chol_params)
    new_parameters, new_opt_state, loss = elbo_step(
        rng_key,
        parameters,
        state.opt_state,
        logdensity_fn,
        optimizer,
        lambda key, params, n: _sample(key, params[0], params[1], n),
        lambda params: generate_fullrank_logdensity(params[0], params[1]),
        num_samples,
        objective=objective,
        stl_estimator=stl_estimator,
    )
    return FRVIState(new_parameters[0], new_parameters[1], new_opt_state), FRVIInfo(loss)


def sample(rng_key: PRNGKey, state: FRVIState, num_samples: int = 1):
    return _sample(rng_key, state.mu, state.chol_params, num_samples)


def as_top_level_api(
    logdensity_fn: Callable,
    optimizer: GradientTransformation,
    num_samples: int = 100,
    objective: Objective = KL(),
    stl_estimator: bool = True,
) -> VIAlgorithm:
    """``blackjax_tpu.fullrank_vi(...)``."""

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
