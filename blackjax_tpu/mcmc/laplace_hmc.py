"""HMC on the Laplace-approximated marginal, with the latent MAP
``theta_star`` warm-started through the chain.

Behavioral parity target: ``blackjax/mcmc/laplace_hmc.py`` (warm-start
threading :14-40, kernel :120).
"""
from typing import Callable, NamedTuple

import jax

from blackjax_tpu.base import SamplingAlgorithm, build_sampling_algorithm
from blackjax_tpu.mcmc import hmc, integrators, metrics
from blackjax_tpu.mcmc.laplace_marginal import (
    LaplaceHMCInfo,
    LaplaceMarginal,
    laplace_marginal_factory,
)
from blackjax_tpu.types import ArrayLikeTree, ArrayTree, PRNGKey

__all__ = ["LaplaceHMCState", "LaplaceHMCInfo", "init", "build_kernel", "as_top_level_api"]


class LaplaceHMCState(NamedTuple):
    """Hyperparameter chain state plus the latent MAP carried as the
    warm-start hint for the next inner solves."""

    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree
    theta_star: ArrayTree


def init(position: ArrayLikeTree, laplace: LaplaceMarginal) -> LaplaceHMCState:
    (logdensity, theta_star), logdensity_grad = jax.value_and_grad(
        laplace, has_aux=True
    )(position)
    return LaplaceHMCState(position, logdensity, logdensity_grad, theta_star)


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    build_proposal: Callable = hmc.hmc_proposal,
) -> Callable:
    """Laplace-HMC kernel: every leapfrog logdensity evaluation warm-starts
    the inner L-BFGS from the incoming ``theta_star``; one explicit
    post-accept refresh surfaces its diagnostics."""
    hmc_kernel = hmc.build_kernel(integrator, divergence_threshold, build_proposal)

    def kernel(
        rng_key: PRNGKey,
        state: LaplaceHMCState,
        laplace: LaplaceMarginal,
        step_size: float,
        inverse_mass_matrix: metrics.MetricTypes,
        num_integration_steps: int,
    ) -> tuple[LaplaceHMCState, LaplaceHMCInfo]:
        theta_prev = state.theta_star

        def logdensity_fn(phi):
            lp, _ = laplace(phi, theta_prev)
            return lp

        hmc_state = hmc.HMCState(state.position, state.logdensity, state.logdensity_grad)
        new_hmc_state, hmc_info = hmc_kernel(
            rng_key,
            hmc_state,
            logdensity_fn,
            step_size,
            inverse_mass_matrix,
            num_integration_steps,
        )
        new_theta_star, lbfgs_diag = laplace.solve_theta_with_info(
            new_hmc_state.position, theta_prev
        )
        new_state = LaplaceHMCState(
            new_hmc_state.position,
            new_hmc_state.logdensity,
            new_hmc_state.logdensity_grad,
            new_theta_star,
        )
        info = LaplaceHMCInfo(
            momentum=hmc_info.momentum,
            acceptance_rate=hmc_info.acceptance_rate,
            is_accepted=hmc_info.is_accepted,
            is_divergent=hmc_info.is_divergent,
            energy=hmc_info.energy,
            proposal=hmc_info.proposal,
            num_integration_steps=hmc_info.num_integration_steps,
            lbfgs_iter_num=lbfgs_diag.iter_num,
            lbfgs_error=lbfgs_diag.error,
            lbfgs_converged=lbfgs_diag.converged,
            lbfgs_hit_maxiter=lbfgs_diag.hit_maxiter,
        )
        return new_state, info

    return kernel


def as_top_level_api(
    log_joint_fn: Callable,
    theta_init: ArrayLikeTree,
    step_size: float,
    inverse_mass_matrix: metrics.MetricTypes,
    num_integration_steps: int,
    *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    build_proposal: Callable = hmc.hmc_proposal,
    **optimizer_kwargs,
) -> SamplingAlgorithm:
    """``blackjax_tpu.laplace_hmc(...)``: HMC over hyperparameters ``phi``
    of ``log_joint_fn(theta, phi)`` with the latent ``theta`` integrated out
    by Laplace."""
    laplace = laplace_marginal_factory(log_joint_fn, theta_init, **optimizer_kwargs)
    kernel = build_kernel(integrator, divergence_threshold, build_proposal)
    return build_sampling_algorithm(
        kernel,
        init,
        laplace,
        kernel_args=(step_size, inverse_mass_matrix, num_integration_steps),
    )
