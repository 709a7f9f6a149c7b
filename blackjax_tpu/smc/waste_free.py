"""Waste-free SMC update strategy (Dau & Chopin 2020, Algorithm 2).

Behavioral parity target: ``blackjax/smc/waste_free.py:10`` — resample
``N/p`` seeds, run ``p-1`` MCMC steps per seed, keep ALL intermediate states
so the particle cloud stays at ``N``.
"""
import functools

import jax
import jax.numpy as jnp

from blackjax_tpu.smc.base import map_kernel

__all__ = ["update_waste_free", "waste_free_smc"]


def update_waste_free(
    mcmc_init_fn,
    logposterior_fn,
    mcmc_step_fn,
    n_particles: int,
    p: int,
    num_resampled,
    num_mcmc_steps=None,
    batch_size: int = 0,
):
    """Return ``(update_fn, num_resampled)``: each of the ``num_resampled``
    seed particles contributes itself plus the ``p-1`` states of its chain."""
    if num_mcmc_steps is not None:
        raise ValueError(
            "Waste-free SMC derives its chain length from p; pass num_mcmc_steps=None."
        )
    num_mcmc_steps = p - 1

    def chain_from(rng_key, position, step_parameters):
        state = mcmc_init_fn(position, logposterior_fn)

        def body(state, key):
            new_state, info = mcmc_step_fn(key, state, logposterior_fn, **step_parameters)
            return new_state, (new_state, info)

        _, (states, infos) = jax.lax.scan(
            body, state, jax.random.split(rng_key, num_mcmc_steps)
        )
        return states, infos

    def update(rng_key, position, step_parameters):
        states, infos = map_kernel(chain_from, batch_size)(
            rng_key, position, step_parameters
        )

        def flatten_chain_axis(x):
            seeds, steps, *rest = x.shape
            return x.reshape((seeds * steps, *rest))

        chain_particles = jax.tree.map(flatten_chain_axis, states.position)
        all_particles = jax.tree.map(
            lambda seed, chain: jnp.concatenate([seed, chain]), position, chain_particles
        )
        return all_particles, infos

    return update, num_resampled


def waste_free_smc(n_particles, p):
    """Build the ``update_strategy`` closure for ``p``-step waste-free SMC."""
    if n_particles % p != 0:
        raise ValueError("p must divide n_particles.")
    return functools.partial(update_waste_free, num_resampled=n_particles // p, p=p)
