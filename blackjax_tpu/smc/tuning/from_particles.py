"""Static inner-kernel tuning from the particle cloud.

Behavioral parity target: ``blackjax/smc/tuning/from_particles.py``.
"""
import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.types import Array

__all__ = [
    "particles_means",
    "particles_stds",
    "particles_covariance_matrix",
    "inverse_mass_matrix_from_particles",
    "particles_as_rows",
]


def particles_as_rows(particles):
    """Ravel each particle: (n_particles, total_dim) matrix."""
    return jax.vmap(lambda x: ravel_pytree(x)[0])(particles)


def particles_means(particles):
    return jnp.mean(particles_as_rows(particles), axis=0)


def particles_stds(particles):
    return jnp.std(particles_as_rows(particles), axis=0)


def particles_covariance_matrix(particles):
    return jnp.cov(particles_as_rows(particles), ddof=0, rowvar=False)


def inverse_mass_matrix_from_particles(particles) -> Array:
    """Diagonal IMM from the particle variances (Buchholz et al. 2018 §3.1)."""
    return jnp.diag(jnp.var(particles_as_rows(particles), axis=0))
