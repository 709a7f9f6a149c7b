"""Dynamic-trajectory-length HMC over a Laplace-approximated marginal.

Composition of two house combinators: the warm-started marginal transition
(:func:`blackjax_tpu.mcmc.laplace_hmc.run_warm_started`) around the
dynamic-length HMC kernel (:mod:`blackjax_tpu.mcmc.dynamic_hmc`).  The
chain state carries both the latent MAP warm start and the trajectory-
length generator argument.

Behavioral parity: ``blackjax/mcmc/laplace_dynamic_hmc.py``.
"""
from typing import Callable, NamedTuple

import jax

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import dynamic_hmc, hmc, integrators, metrics
from blackjax_tpu.mcmc.dynamic_hmc import _fresh_key, _uniform_steps
from blackjax_tpu.mcmc.laplace_hmc import run_warm_started
from blackjax_tpu.mcmc.laplace_marginal import (
    LaplaceHMCInfo,
    LaplaceMarginal,
    laplace_marginal_factory,
)
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["LaplaceDynamicHMCState", "init", "build_kernel", "as_top_level_api"]




class LaplaceDynamicHMCState(NamedTuple):
    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree
    theta_star: ArrayTree
    random_generator_arg: Array


def init(
    position: ArrayLikeTree, laplace: LaplaceMarginal, random_generator_arg: Array
) -> LaplaceDynamicHMCState:
    grad_with_mode = jax.value_and_grad(laplace, has_aux=True)
    (logdensity, theta_star), logdensity_grad = grad_with_mode(position)
    return LaplaceDynamicHMCState(
        position, logdensity, logdensity_grad, theta_star, random_generator_arg
    )


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    next_random_arg_fn: Callable = _fresh_key,
    integration_steps_fn: Callable = _uniform_steps,
    build_proposal: Callable = hmc.hmc_proposal,
) -> Callable:
    dyn_kernel = dynamic_hmc.build_kernel(
        integrator, divergence_threshold, next_random_arg_fn,
        integration_steps_fn, build_proposal,
    )

    def kernel(
        rng_key: PRNGKey, state: LaplaceDynamicHMCState,
        laplace: LaplaceMarginal, step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        integration_steps_params: tuple = (),
    ) -> tuple[LaplaceDynamicHMCState, LaplaceHMCInfo]:
        def inner_step(logdensity_fn):
            chain = dynamic_hmc.DynamicHMCState(
                state.position, state.logdensity, state.logdensity_grad,
                state.random_generator_arg,
            )
            return dyn_kernel(
                rng_key, chain, logdensity_fn, step_size, inverse_mass_matrix,
                integration_steps_params,
            )

        moved, theta_star, info = run_warm_started(
            laplace, state.theta_star, inner_step
        )
        return (
            LaplaceDynamicHMCState(
                moved.position, moved.logdensity, moved.logdensity_grad,
                theta_star, moved.random_generator_arg,
            ),
            info,
        )

    return kernel


def as_top_level_api(
    log_joint_fn: Callable, theta_init: ArrayLikeTree, step_size: float,
    inverse_mass_matrix: metrics.MetricTypes, *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    next_random_arg_fn: Callable = _fresh_key,
    integration_steps_fn: Callable = _uniform_steps,
    integration_steps_params: tuple = (),
    build_proposal: Callable = hmc.hmc_proposal, **optimizer_kwargs,
) -> SamplingAlgorithm:
    """``blackjax_tpu.laplace_dhmc(...)``."""
    laplace = laplace_marginal_factory(log_joint_fn, theta_init, **optimizer_kwargs)
    kernel = build_kernel(
        integrator, divergence_threshold, next_random_arg_fn,
        integration_steps_fn, build_proposal,
    )
    return build_sampling_algorithm(
        kernel, init, laplace,
        kernel_args=(step_size, inverse_mass_matrix, integration_steps_params),
        pass_rng_key_to_init=True,
    )
