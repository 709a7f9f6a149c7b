"""Multi-path Pathfinder: independent vmapped Pathfinder runs + PSIS
importance resampling across the pooled draws (Zhang et al. 2022,
Algorithm 2).

Behavioral parity target: ``blackjax/vi/multipathfinder.py``
(``multi_approximate`` :54, PSIS weighting :134).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from blackjax_tpu.base import VIAlgorithm
from blackjax_tpu.diagnostics import psis_weights as _psis_weights
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey
from blackjax_tpu.vi.pathfinder import PathfinderInfo, PathfinderState, approximate, sample

__all__ = ["MultipathfinderState", "multi_approximate", "psis_weights", "as_top_level_api"]


class MultipathfinderState(NamedTuple):
    path_states: PathfinderState
    samples: ArrayTree  # (n_paths, num_samples, ...)
    logp: Array
    logq: Array


def multi_approximate(
    rng_key: PRNGKey,
    logdensity_fn: Callable,
    initial_positions: ArrayLikeTree,
    num_samples: int = 200,
    *,
    maxiter: int = 30,
    maxcor: int = 10,
    maxls: int = 1000,
    gtol: float = 1e-08,
    ftol: float = 1e-05,
) -> tuple[MultipathfinderState, PathfinderInfo]:
    """Run one Pathfinder per row of ``initial_positions`` (vmapped) and
    collect per-path draws with their log-densities for PSIS."""
    n_paths = jax.tree.leaves(initial_positions)[0].shape[0]
    approx_key, sample_key = jax.random.split(rng_key)

    path_states, _ = jax.vmap(
        lambda key, x0: approximate(
            key,
            logdensity_fn,
            x0,
            num_samples,
            maxiter=maxiter,
            maxcor=maxcor,
            maxls=maxls,
            gtol=gtol,
            ftol=ftol,
        )
    )(jax.random.split(approx_key, n_paths), initial_positions)

    def draw(key, state):
        draws, logq = sample(key, state, num_samples)
        logp = jax.vmap(logdensity_fn)(draws)
        return draws, logp, logq

    samples, logp, logq = jax.vmap(draw)(
        jax.random.split(sample_key, n_paths), path_states
    )
    return (
        MultipathfinderState(path_states, samples, logp, logq),
        PathfinderInfo(path=path_states),
    )


def psis_weights(state: MultipathfinderState) -> tuple[Array, Array]:
    """Pareto-smoothed, normalized log importance weights over the pooled
    draws and the Pareto k-hat diagnostic."""
    log_ratios = (state.logp - state.logq).ravel()
    smoothed, k = _psis_weights(log_ratios)
    return smoothed - logsumexp(smoothed), k


def as_top_level_api(logdensity_fn: Callable) -> VIAlgorithm:
    """``blackjax_tpu.multipathfinder(...)``: ``sample`` importance-resamples
    the pooled per-path draws by their PSIS weights."""

    def init_fn(rng_key, initial_positions, num_samples: int = 200, **lbfgs_parameters):
        return multi_approximate(
            rng_key, logdensity_fn, initial_positions, num_samples, **lbfgs_parameters
        )

    def step_fn(rng_key, state):
        return state, None

    def sample_fn(rng_key, state: MultipathfinderState, num_samples: int):
        log_w, _ = psis_weights(state)
        pool = jax.tree.map(lambda x: x.reshape(-1, *x.shape[2:]), state.samples)
        idx = jax.random.choice(
            rng_key, log_w.shape[0], shape=(num_samples,), replace=True, p=jnp.exp(log_w)
        )
        return jax.tree.map(lambda x: x[idx], pool)

    return VIAlgorithm(init_fn, step_fn, sample_fn)
