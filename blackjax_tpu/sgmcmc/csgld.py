"""Contour SGLD: flat-histogram dynamic importance sampling over energy
bins for multimodal targets (Deng et al. 2020/2022).

Behavioral parity target: ``blackjax/sgmcmc/csgld.py`` (state :29, kernel
:56).
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.sgmcmc.diffusions import overdamped_langevin
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["ContourSGLDState", "init", "build_kernel", "as_top_level_api"]


class ContourSGLDState(NamedTuple):
    """Position, the running estimate of the energy-bin occupation
    probabilities, and the current bin index."""

    position: ArrayTree
    energy_pdf: Array
    energy_idx: int


def init(position: ArrayLikeTree, num_partitions: int = 512) -> ContourSGLDState:
    ramp = jnp.arange(num_partitions, 0, -1)
    return ContourSGLDState(position, ramp / ramp.sum(), num_partitions - 1)


def build_kernel(num_partitions=512, energy_gap=10, min_energy=0) -> Callable:
    """The energy axis ``[min_energy, min_energy + m * gap]`` is divided into
    ``m`` bins; the drift is rescaled by the estimated local log-density of
    the energy histogram (flattening the landscape), and the histogram is
    updated by stochastic approximation."""
    integrator = overdamped_langevin()

    def kernel(
        rng_key: PRNGKey,
        state: ContourSGLDState,
        logdensity_estimator: Callable,
        gradient_estimator: Callable,
        minibatch: ArrayLikeTree,
        step_size_diff: float,
        step_size_stoch: float = 1e-3,
        zeta: float = 1,
        temperature: float = 1.0,
    ) -> ContourSGLDState:
        position, energy_pdf, idx = state

        drift_scale = 1.0 + zeta * temperature * (
            jnp.log(energy_pdf[idx]) - jnp.log(energy_pdf[idx - 1])
        ) / energy_gap

        grad = gradient_estimator(position, minibatch)
        position = integrator(
            rng_key,
            position,
            jax.tree.map(lambda g: drift_scale * g, grad),
            step_size_diff,
            temperature,
        )

        # locate the new energy bin and nudge the histogram toward it
        neg_logprob = -logdensity_estimator(position, minibatch)
        idx = jnp.clip(
            jnp.floor((neg_logprob - min_energy) / energy_gap + 1).astype(jnp.int32),
            min=1,
            max=num_partitions - 1,
        )
        delta = -energy_pdf
        delta = delta.at[idx].add(1.0)
        energy_pdf = energy_pdf + step_size_stoch * energy_pdf[idx] * delta

        return ContourSGLDState(position, energy_pdf, idx)

    return kernel


def as_top_level_api(
    logdensity_estimator: Callable,
    gradient_estimator: Callable,
    zeta: float = 1,
    temperature: float = 0.01,
    num_partitions: int = 512,
    energy_gap: float = 100,
    min_energy: float = 0,
) -> SamplingAlgorithm:
    """``blackjax_tpu.csgld(...)``."""
    kernel = build_kernel(num_partitions, energy_gap, min_energy)

    def init_fn(position, rng_key=None):
        del rng_key
        return init(position, num_partitions)

    def step_fn(rng_key, state, minibatch, step_size_diff, step_size_stoch=1e-3):
        return kernel(
            rng_key,
            state,
            logdensity_estimator,
            gradient_estimator,
            minibatch,
            step_size_diff,
            step_size_stoch,
            zeta,
            temperature,
        )

    return SamplingAlgorithm(init_fn, step_fn)
