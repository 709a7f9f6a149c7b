"""Stein Variational Gradient Descent (Liu & Wang 2016).

Behavioral parity target: ``blackjax/vi/svgd.py`` (kernel :52, RBF :116,
median heuristic :136). The O(n^2) particle interaction is two nested vmaps
— a batched kernel matrix that XLA maps onto the MXU.
"""
import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.flatten_util import ravel_pytree

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.types import ArrayTree

__all__ = [
    "SVGDState",
    "init",
    "build_kernel",
    "as_top_level_api",
    "rbf_kernel",
    "update_median_heuristic",
    "median_heuristic",
]


class SVGDState(NamedTuple):
    particles: ArrayTree
    kernel_parameters: dict
    opt_state: optax.OptState


def init(
    initial_particles: ArrayTree,
    kernel_parameters: dict,
    optimizer: optax.GradientTransformation,
) -> SVGDState:
    return SVGDState(initial_particles, kernel_parameters, optimizer.init(initial_particles))


def build_kernel(optimizer: optax.GradientTransformation):
    """One SVGD step: particles move along the kernelized Stein functional
    gradient ``phi*(x) = E_p[k(p, x) grad logpi(p) + grad_p k(p, x)]``."""

    def kernel(
        state: SVGDState,
        grad_logdensity_fn: Callable,
        kernel: Callable,
        **grad_params,
    ) -> SVGDState:
        particles, kernel_params, opt_state = state
        bound_kernel = functools.partial(kernel, **kernel_params)

        def interaction(source, target):
            gradient = grad_logdensity_fn(source, **grad_params)
            k_val, k_grad = jax.value_and_grad(bound_kernel, argnums=0)(source, target)
            # optimizer convention: minimize, so negate the ascent direction
            return jax.tree.map(lambda g, gk: -(k_val * g) - gk, gradient, k_grad)

        functional_gradient = jax.vmap(
            lambda target: jax.tree.map(
                lambda phi: phi.mean(axis=0),
                jax.vmap(lambda source: interaction(source, target))(particles),
            )
        )(particles)

        updates, opt_state = optimizer.update(functional_gradient, opt_state, particles)
        particles = optax.apply_updates(particles, updates)
        return SVGDState(particles, kernel_params, opt_state)

    return kernel


def rbf_kernel(x, y, length_scale=1):
    sq = ravel_pytree(jax.tree.map(lambda a, b: (a - b) ** 2, x, y))[0]
    return jnp.exp(-jnp.sum(sq) / length_scale)


def median_heuristic(kernel_parameters, particles):
    """``length_scale = median(pairwise distance)^2 / log n``."""
    rows = jax.vmap(lambda p: ravel_pytree(p)[0])(particles)

    def distance(a, b):
        return jnp.linalg.norm(jnp.atleast_1d(a - b))

    pairwise = jax.vmap(jax.vmap(distance, (None, 0)), (0, None))(rows, rows)
    below_diag = pairwise[jnp.tril_indices(pairwise.shape[0], k=-1)]
    n = rows.shape[0]
    median = jnp.median(below_diag)
    return {**kernel_parameters, "length_scale": median**2 / jnp.log(n)}


update_median_heuristic = median_heuristic


def as_top_level_api(
    grad_logdensity_fn: Callable,
    optimizer,
    kernel: Callable = rbf_kernel,
    update_kernel_parameters: Callable = median_heuristic,
):
    """``blackjax_tpu.svgd(...)``: returns a SamplingAlgorithm whose step
    also refreshes the kernel parameters (median heuristic by default)."""
    kernel_fn = build_kernel(optimizer)

    def init_fn(initial_particles: ArrayTree, kernel_parameters: dict = {"length_scale": 1.0}):
        return init(initial_particles, kernel_parameters, optimizer)

    def step_fn(state: SVGDState, **grad_params) -> SVGDState:
        state = SVGDState(
            state.particles,
            update_kernel_parameters(state.kernel_parameters, state.particles),
            state.opt_state,
        )
        return kernel_fn(state, grad_logdensity_fn, kernel, **grad_params)

    return SamplingAlgorithm(init_fn, step_fn)
