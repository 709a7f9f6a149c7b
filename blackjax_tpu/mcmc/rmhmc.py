"""Riemannian-manifold HMC: the HMC kernel with a position-dependent mass
matrix and the implicit-midpoint integrator (non-separable Hamiltonian).

Behavioral parity target: ``blackjax/mcmc/rmhmc.py:29-77``.
"""
from typing import Callable, Union

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import hmc, integrators, metrics

__all__ = ["init", "build_kernel", "as_top_level_api"]

init = hmc.init
build_kernel = hmc.build_kernel


def as_top_level_api(
    logdensity_fn: Callable,
    step_size: float,
    mass_matrix: Union[metrics.Metric, Callable],
    num_integration_steps: int,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.implicit_midpoint,
) -> SamplingAlgorithm:
    """``blackjax_tpu.rmhmc(...)``: HMC whose default integrator is implicit
    midpoint; ``mass_matrix`` is a callable ``position -> M(position)``."""
    kernel = build_kernel(integrator, divergence_threshold)
    return build_sampling_algorithm(
        kernel,
        init,
        logdensity_fn,
        kernel_args=(step_size, mass_matrix, num_integration_steps),
    )
