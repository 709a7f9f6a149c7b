"""Evidence (logZ) accumulation for nested sampling.

Behavioral parity target: ``blackjax/ns/integrator.py`` (:79 shell anchored
on the pre-deletion volume).
"""
from typing import NamedTuple

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from blackjax_tpu.ns.base import StateWithLogLikelihood
from blackjax_tpu.types import Array

__all__ = ["NSIntegrator", "init_integrator", "update_integrator"]


def log1mexp(x: Array) -> Array:
    """Stable ``log(1 - exp(x))`` for x <= 0 (clamped against f32 drift)."""
    x = jnp.minimum(x, -jnp.finfo(x.dtype).eps)
    return jnp.where(x > -0.6931472, jnp.log(-jnp.expm1(x)), jnp.log1p(-jnp.exp(x)))


def _logmeanexp(x: Array) -> Array:
    return logsumexp(x) - jnp.log(jnp.asarray(x.shape[0]))


class NSIntegrator(NamedTuple):
    """Accumulated log prior volume, dead-point evidence and live-point
    evidence estimate."""

    logX: Array
    logZ: Array
    logZ_live: Array


def init_integrator(particle_state: StateWithLogLikelihood) -> NSIntegrator:
    dtype = particle_state.loglikelihood.dtype
    logX = jnp.array(0.0, dtype=dtype)
    return NSIntegrator(
        logX,
        jnp.array(-jnp.inf, dtype=dtype),
        _logmeanexp(particle_state.loglikelihood) + logX,
    )


def update_integrator(
    integrator: NSIntegrator,
    particle_state: StateWithLogLikelihood,
    dead_particles: StateWithLogLikelihood,
) -> NSIntegrator:
    """Shrink the volume by ``1/n_live`` per deletion and add each dead
    point's likelihood shell, anchored on the PRE-deletion volume (anchoring
    post-deletion biases logZ low by ~1/n)."""
    loglikelihood = particle_state.loglikelihood
    dead_loglikelihood = dead_particles.loglikelihood
    dtype = loglikelihood.dtype

    n = loglikelihood.shape[0]
    k = dead_loglikelihood.shape[0]
    num_live = jnp.arange(n, n - k, -1).astype(dtype)
    delta_logX = -1.0 / num_live
    logX = integrator.logX + jnp.cumsum(delta_logX)
    logX_prev = jnp.concatenate([integrator.logX[jnp.newaxis], logX[:-1]])
    log_shell = logX_prev + log1mexp(delta_logX)

    logZ = jnp.logaddexp(integrator.logZ, logsumexp(dead_loglikelihood + log_shell))
    return NSIntegrator(logX[-1], logZ, _logmeanexp(loglikelihood) + logX[-1])
