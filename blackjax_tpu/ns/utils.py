"""Nested sampling post-processing: effective live counts, stochastic
volume simulation, importance weights, evidence and posterior resampling.

Behavioral parity target: ``blackjax/ns/utils.py`` (``compute_num_live``
:46 [Fowlie, Handley & Su 2021], ``logX`` :86, ``log_weights`` :132,
``finalise`` :166, ``ess`` :204, ``sample`` :228).
"""
from typing import Callable

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from blackjax_tpu.ns.base import NSInfo, NSState
from blackjax_tpu.ns.integrator import log1mexp
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "compute_num_live",
    "logX",
    "log_weights",
    "finalise",
    "ess",
    "sample",
    "uniform_prior",
    "log1mexp",
]


def compute_num_live(info: NSInfo) -> Array:
    """Effective number of live points at each death contour, from the merged
    birth/death event stream (handles batched deletions). Expects the
    FINALISED output (dead + final live) so every birth is present."""
    birth = info.particles.loglikelihood_birth
    death = info.particles.loglikelihood

    events_logL = jnp.concatenate([birth, death])
    events_delta = jnp.concatenate(
        [jnp.ones_like(birth, dtype=int), -jnp.ones_like(death, dtype=int)]
    )
    order = jnp.lexsort((events_delta, events_logL, ~jnp.isnan(events_logL)))
    sorted_delta = events_delta[order]
    running = jnp.maximum(jnp.cumsum(sorted_delta), 0)
    return running[sorted_delta == -1] + 1


def logX(rng_key: PRNGKey, dead_info: NSInfo, shape: int = 100):
    """Simulate ``shape`` stochastic volume-shrinkage paths (Skilling 2006);
    returns ``(cumulative logX, trapezoidal log dX)``, both
    ``(n_dead, shape)``. Particles must be sorted by death likelihood."""
    rng_key, subkey = jax.random.split(rng_key)
    n = dead_info.particles.loglikelihood.shape[0]
    u = jax.random.uniform(subkey, (n, shape))
    shrinkage = jnp.log1p(-u) / compute_num_live(dead_info)[:, None]
    cumulative = jnp.cumsum(shrinkage, axis=0)

    prev = jnp.concatenate([jnp.zeros((1, shape)), cumulative[:-1]], axis=0)
    nxt = jnp.concatenate([cumulative[1:], jnp.full((1, shape), -jnp.inf)], axis=0)
    log_dX = log1mexp(nxt - prev) + prev - jnp.log(2.0)
    return cumulative, log_dX


def log_weights(
    rng_key: PRNGKey, dead_info: NSInfo, shape: int = 100, beta: float = 1.0
) -> Array:
    """Log importance weights ``L^beta dX`` per particle (original order
    preserved), ``(n_dead, shape)``."""
    order = jnp.argsort(dead_info.particles.loglikelihood)
    inverse = jnp.empty_like(order).at[order].set(jnp.arange(order.shape[0]))
    sorted_info = jax.tree.map(lambda x: x[order], dead_info)
    _, log_dX = logX(rng_key, sorted_info, shape)
    log_w = log_dX + beta * sorted_info.particles.loglikelihood[..., None]
    return log_w[inverse]


def finalise(live: NSState, dead: list, update_info: bool = True) -> NSInfo:
    """Concatenate all dead particles with the final live set (whose update
    info has no entries)."""
    if update_info:
        infos = [d.update_info for d in dead]
        final_update_info = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *infos)
    else:
        final_update_info = None
    all_particles = [d.particles for d in dead] + [live.particles]
    particles = jax.tree.map(lambda *xs: jnp.concatenate(xs, axis=0), *all_particles)
    return NSInfo(particles, final_update_info)


def ess(rng_key: PRNGKey, dead: NSInfo) -> Array:
    """Kish effective sample size of the mean importance weights."""
    logw = log_weights(rng_key, dead).mean(axis=-1)
    logw -= logw.max()
    return jnp.exp(2 * logsumexp(logw) - logsumexp(2 * logw))


def sample(rng_key: PRNGKey, dead: NSInfo, shape: int = 1000) -> ArrayTree:
    """Resample posterior draws proportional to the importance weights."""
    logw = log_weights(rng_key, dead).mean(axis=-1)
    idx = jax.random.choice(
        rng_key,
        dead.particles.loglikelihood.shape[0],
        p=jnp.exp(logw.squeeze() - jnp.max(logw)),
        shape=(shape,),
        replace=True,
    )
    return jax.tree.map(lambda leaf: leaf[idx], dead.particles)


def get_first_row(x: ArrayTree) -> ArrayTree:
    return jax.tree.map(lambda leaf: leaf[0], x)


def uniform_prior(rng_key: PRNGKey, num_particles: int, bounds: dict):
    """Convenience uniform box prior: returns ``(particles, logprior_fn)``
    for a dict of per-parameter ``(low, high)`` bounds."""
    keys = jax.random.split(rng_key, len(bounds))
    particles = {}
    total_log_volume = 0.0
    for key, (name, (low, high)) in zip(keys, bounds.items()):
        low, high = jnp.asarray(low), jnp.asarray(high)
        shape = (num_particles,) + low.shape
        particles[name] = jax.random.uniform(key, shape, minval=low, maxval=high)
        total_log_volume += jnp.sum(jnp.log(high - low))

    def logprior_fn(params):
        inside = jnp.asarray(True)
        for name, (low, high) in bounds.items():
            x = params[name]
            inside &= jnp.all(
                (x >= jnp.asarray(low)) & (x <= jnp.asarray(high))
            )
        return jnp.where(inside, -total_log_volume, -jnp.inf)

    return particles, logprior_fn
