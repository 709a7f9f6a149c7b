"""Pathfinder: normal approximations along an L-BFGS optimization path,
best-ELBO iterate selected (Zhang et al. 2022, Algorithm 3).

Behavioral parity target: ``blackjax/vi/pathfinder.py`` (``approximate`` :67,
``sample`` :211). The per-iterate ELBO evaluation is one ``vmap`` over the
whole path — every iterate's factored-Gaussian sampling and ELBO Monte Carlo
run as a single batched program.
"""
from typing import Callable, NamedTuple, Union

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import VIAlgorithm
from blackjax_tpu.optimizers.lbfgs import (
    _minimize_lbfgs_flat,
    bfgs_sample,
    lbfgs_inverse_hessian_factors,
)
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["PathfinderState", "PathfinderInfo", "approximate", "sample", "as_top_level_api"]


class PathfinderState(NamedTuple):
    """One point of the path: ELBO of its local Gaussian plus the factored
    inverse Hessian needed to sample from it."""

    elbo: Array
    position: ArrayTree
    grad_position: ArrayTree
    alpha: Array
    beta: Array
    gamma: Array


class PathfinderInfo(NamedTuple):
    path: PathfinderState


def approximate(
    rng_key: PRNGKey,
    logdensity_fn: Callable,
    initial_position: ArrayLikeTree,
    num_samples: int = 200,
    *,
    maxiter=30,
    maxcor=10,
    maxls=1000,
    gtol=1e-08,
    ftol=1e-05,
    **lbfgs_kwargs,
) -> tuple[PathfinderState, PathfinderInfo]:
    """Run L-BFGS on ``-logdensity``, build a factored Gaussian at every
    iterate from its trailing (s, z) window, estimate each ELBO with
    ``num_samples`` draws, and return the argmax iterate (plus the full
    path)."""
    x0, unravel = ravel_pytree(initial_position)

    def objective(x):
        return -logdensity_fn(unravel(x))

    (_, status), history = _minimize_lbfgs_flat(
        objective, x0, maxiter, maxcor, gtol, ftol, maxls
    )

    position, grad_position, alpha = history.x, history.g, history.alpha
    update_mask = history.update_mask[1:]
    s = jnp.diff(position, axis=0)
    z = jnp.diff(grad_position, axis=0)
    s = jnp.where(update_mask, s, 0.0)
    z = jnp.where(update_mask, z, 0.0)
    # left-pad so every iterate has a static maxcor-length trailing window
    s = jnp.pad(s, ((maxcor, 0), (0, 0)))
    z = jnp.pad(z, ((maxcor, 0), (0, 0)))

    def gaussian_at(i, key_i):
        window = i + jnp.arange(maxcor)
        S, Z = s[window], z[window]
        beta, gamma = lbfgs_inverse_hessian_factors(S.T, Z.T, alpha[i])
        phi, logq = bfgs_sample(
            key_i, num_samples, position[i], grad_position[i], alpha[i], beta, gamma
        )
        logp = -jax.vmap(objective)(phi)
        return (logp - logq).mean(), beta, gamma

    path_size = maxiter + 1
    keys = jax.random.split(rng_key, path_size)
    elbo, beta, gamma = jax.vmap(gaussian_at)(jnp.arange(path_size), keys)

    # iterates beyond convergence (or with non-finite ELBO) are ineligible
    elbo = jnp.where(
        (jnp.arange(path_size) < status.iter_num) & jnp.isfinite(elbo), elbo, -jnp.inf
    )

    batched_unravel = jax.vmap(unravel)
    path = PathfinderState(
        elbo, batched_unravel(position), batched_unravel(grad_position), alpha, beta, gamma
    )
    best = jnp.argmax(elbo)
    return jax.tree.map(lambda x: x[best], path), PathfinderInfo(path)


def sample(
    rng_key: PRNGKey,
    state: PathfinderState,
    num_samples: Union[int, tuple] = (),
) -> ArrayTree:
    """Draw from the chosen factored Gaussian; returns ``(samples, logq)``."""
    position_flat, unravel = ravel_pytree(state.position)
    grad_flat, _ = ravel_pytree(state.grad_position)
    phi, logq = bfgs_sample(
        rng_key, num_samples, position_flat, grad_flat, state.alpha, state.beta, state.gamma
    )
    if num_samples == ():
        return unravel(phi), logq
    return jax.vmap(unravel)(phi), logq


def as_top_level_api(logdensity_fn: Callable) -> VIAlgorithm:
    """``blackjax_tpu.pathfinder(...)``: one-shot — all work happens in
    ``init``; ``step`` is a no-op kept for interface compatibility."""

    def init_fn(rng_key, position, num_samples: int = 200, **lbfgs_parameters):
        return approximate(rng_key, logdensity_fn, position, num_samples, **lbfgs_parameters)

    def step_fn(rng_key, state):
        return state, PathfinderInfo(path=state)

    def sample_fn(rng_key, state, num_samples):
        return sample(rng_key, state, num_samples)

    return VIAlgorithm(init_fn, step_fn, sample_fn)
