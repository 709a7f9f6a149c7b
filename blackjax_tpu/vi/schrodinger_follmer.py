"""Schrödinger-Föllmer sampler: a diffusion bridge from a Dirac at zero to
the target over unit time, with the drift estimated by inner Monte Carlo
(Huang et al. 2021).

Behavioral parity target: ``blackjax/vi/schrodinger_follmer.py`` (drift
estimator step :61; Stein's-lemma-free ratio form with a standard-Gaussian
base-measure correction).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import VIAlgorithm
from blackjax_tpu.types import ArrayLike, ArrayLikeTree, PRNGKey

__all__ = ["SchrodingerFollmerState", "SchrodingerFollmerInfo", "init", "step", "sample"]


class SchrodingerFollmerState(NamedTuple):
    position: ArrayLikeTree
    time: ArrayLike


class SchrodingerFollmerInfo(NamedTuple):
    drift: ArrayLikeTree


def _relative_to_gaussian(position, logdensity_fn):
    """The algorithm needs the density w.r.t. the standard Gaussian base
    measure; add back the Gaussian's negative log-density."""
    norm = sum(jax.tree.leaves(jax.tree.map(lambda a: 0.5 * jnp.sum(a**2), position)))
    return logdensity_fn(position) + norm


def init(example_position: ArrayLikeTree) -> SchrodingerFollmerState:
    return SchrodingerFollmerState(jax.tree.map(jnp.zeros_like, example_position), 0.0)


def step(
    rng_key: PRNGKey,
    state: SchrodingerFollmerState,
    logdensity_fn: Callable,
    step_size: float,
    n_samples: int,
) -> tuple[SchrodingerFollmerState, SchrodingerFollmerInfo]:
    """One Euler-Maruyama step; the drift is a self-normalized Monte Carlo
    ratio over ``n_samples`` Gaussian perturbations at scale sqrt(1-t)."""
    drift_key, sde_key = jax.random.split(rng_key)
    flat, unravel = ravel_pytree(state.position)
    scale = jnp.sqrt(1.0 - state.time)

    eps = jax.random.normal(drift_key, (n_samples,) + flat.shape)
    eps_tree = jax.vmap(unravel)(eps)
    perturbed = jax.tree.map(lambda a, e: a[None, ...] + scale * e, state.position, eps_tree)

    log_pdf = jax.vmap(_relative_to_gaussian, in_axes=[0, None])(perturbed, logdensity_fn)
    log_pdf -= jnp.max(log_pdf, axis=0, keepdims=True)
    pdf = jnp.exp(log_pdf)

    numerator = jax.tree.map(lambda e: pdf @ e, eps_tree)
    denominator = scale * jnp.sum(pdf, axis=0)
    drift = jax.tree.map(lambda a: a / denominator, numerator)

    noise = unravel(jax.random.normal(sde_key, flat.shape))
    next_position = jax.tree.map(
        lambda x, b, w: x + step_size * b + jnp.sqrt(step_size) * w,
        state.position,
        drift,
        noise,
    )
    return (
        SchrodingerFollmerState(next_position, state.time + step_size),
        SchrodingerFollmerInfo(drift),
    )


def sample(
    rng_key: PRNGKey,
    initial_state: SchrodingerFollmerState,
    log_density_fn: Callable,
    n_steps: int,
    n_inner_samples: int,
    n_samples: int = 1,
):
    """Integrate ``n_samples`` independent bridges over ``n_steps`` Euler
    steps; returns the terminal states."""
    dt = 1.0 / n_steps
    positions = jax.tree.map(
        lambda a: jnp.zeros((n_samples, *a.shape), dtype=a.dtype), initial_state.position
    )
    states = SchrodingerFollmerState(positions, jnp.zeros((n_samples,)))

    def body(i, states):
        keys = jax.random.split(jax.random.fold_in(rng_key, i), n_samples)
        next_states, _ = jax.vmap(step, [0, 0, None, None, None])(
            keys, states, log_density_fn, dt, n_inner_samples
        )
        return next_states

    return jax.lax.fori_loop(0, n_steps, body, states)


def as_top_level_api(
    logdensity_fn: Callable, n_steps: int, n_inner_samples: int
) -> VIAlgorithm:
    """``blackjax_tpu.schrodinger_follmer(...)``."""

    def init_fn(position):
        return init(position)

    def step_fn(rng_key, state):
        return step(rng_key, state, logdensity_fn, 1.0 / n_steps, n_inner_samples)

    def sample_fn(rng_key, state, n_samples):
        return sample(rng_key, state, logdensity_fn, n_steps, n_inner_samples, n_samples)

    return VIAlgorithm(init_fn, step_fn, sample_fn)
