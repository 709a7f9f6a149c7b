"""Generic SMC step: resample -> move (vmapped MCMC) -> reweight.

Behavioral parity target: ``blackjax/smc/base.py`` (step :98, shared-vs-per-
particle params :179, memory-capped batching :200, take-last update strategy
:216).

TPU notes: particles live as ``(n_particles, ...)`` HBM-resident blocks; the
move is one vmapped kernel over the block; the resampling gather
``x[ancestors]`` is the only data movement and lowers to an efficient XLA
gather (on a sharded mesh it becomes the cross-device exchange — see
``blackjax_tpu.parallel``).
"""
from typing import Any, Callable, NamedTuple, Optional, Protocol, Union

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "SMCState",
    "SMCInfo",
    "init",
    "step",
    "extend_params",
    "map_fn",
    "map_kernel",
    "update_and_take_last",
]


class SMCState(NamedTuple):
    """Particles ``(n_particles, ...)`` per leaf, normalized weights, and the
    (possibly per-particle) parameters handed to the update function."""

    particles: ArrayTree
    weights: Array
    update_parameters: ArrayTree


class SMCInfo(NamedTuple):
    """Ancestor indices chosen by resampling, the log-normalizing-constant
    increment, and the inner update's info."""

    ancestors: Array
    log_likelihood_increment: Union[float, Array]
    update_info: NamedTuple


def _num_particles(particles) -> int:
    return jax.tree.leaves(particles)[0].shape[0]


def init(particles: ArrayLikeTree, init_update_params: ArrayTree) -> SMCState:
    n = _num_particles(particles)
    return SMCState(particles, jnp.full(n, 1.0 / n), init_update_params)


def step(
    rng_key: PRNGKey,
    state: SMCState,
    update_fn: Callable,
    weight_fn: Callable,
    resample_fn: Callable,
    num_resampled: Optional[int] = None,
) -> tuple[SMCState, SMCInfo]:
    """One Feynman-Kac step: ancestors from ``resample_fn(weights)``, moved
    through the (batched) ``update_fn`` Markov kernel, reweighted by the
    (batched) ``weight_fn`` potential. ``num_resampled < N`` enables
    waste-free variants where the update returns N particles from M seeds."""
    key_update, key_resample = jax.random.split(rng_key)
    n = state.weights.shape[0]
    if num_resampled is None:
        num_resampled = n

    ancestors = resample_fn(key_resample, state.weights, num_resampled)
    particles = jax.tree.map(lambda x: x[ancestors], state.particles)

    keys = jax.random.split(key_update, num_resampled)
    particles, update_info = update_fn(keys, particles, state.update_parameters)

    log_weights = weight_fn(particles)
    log_total = logsumexp(log_weights)
    normalizing_constant_increment = log_total - jnp.log(n)
    weights = jnp.exp(log_weights - log_total)

    return (
        SMCState(particles, weights, state.update_parameters),
        SMCInfo(ancestors, normalizing_constant_increment, update_info),
    )


def extend_params(params: ArrayTree) -> ArrayTree:
    """Mark parameters as shared across particles by giving every leaf a
    leading axis of length 1."""
    return jax.tree.map(lambda x: jnp.asarray(x)[None, ...], params)


def map_fn(fn: Callable, batch_size: int) -> Callable:
    """vmap, or memory-capped sequential batching via ``lax.map`` when
    ``batch_size > 0``."""
    if batch_size > 0:
        return lambda xs: jax.lax.map(fn, xs, batch_size=batch_size)
    return jax.vmap(fn)


def map_kernel(kernel: Callable, batch_size: int) -> Callable:
    """Batched n-ary kernel over the leading particle axis."""
    if batch_size > 0:
        return lambda *args: jax.lax.map(
            lambda bundle: kernel(*bundle), args, batch_size=batch_size
        )
    return jax.vmap(kernel)


def update_and_take_last(
    mcmc_init_fn: Callable,
    tempered_logposterior_fn: Callable,
    shared_mcmc_step_fn: Callable,
    num_mcmc_steps: int,
    n_particles: Union[int, Array],
    batch_size: int = 0,
) -> tuple[Callable, Union[int, Array]]:
    """Update strategy: run ``num_mcmc_steps`` of the kernel from each
    particle and keep only the final position."""

    def mcmc_kernel(rng_key, position, step_parameters):
        state = mcmc_init_fn(position, tempered_logposterior_fn)

        def body(state, key):
            return shared_mcmc_step_fn(
                key, state, tempered_logposterior_fn, **step_parameters
            )

        keys = jax.random.split(rng_key, num_mcmc_steps)
        last_state, info = jax.lax.scan(body, state, keys)
        return last_state.position, info

    return map_kernel(mcmc_kernel, batch_size), n_particles
