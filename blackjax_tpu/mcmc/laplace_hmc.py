"""HMC over the hyperparameters of a Laplace-approximated marginal.

For a joint ``log p(theta, phi)`` with latent ``theta`` and hyperparameters
``phi``, each logdensity evaluation of the ``phi``-chain runs an inner
L-BFGS to the latent mode and adds the Gaussian (Laplace) correction.  The
chain carries the latest latent MAP ``theta_star`` so every inner solve
warm-starts from the previous one — after warmup the solver typically
converges in a couple of iterations, which is what makes the nested scheme
affordable.

:func:`run_warm_started` is the shared combinator: freeze the warm start
for the whole trajectory (so the marginal stays a fixed, differentiable
function during integration), run any HMC-family kernel on it, then refresh
``theta_star`` once at the landing position and splice the solver
diagnostics into the info.  The dynamic-length variant
(:mod:`blackjax_tpu.mcmc.laplace_dynamic_hmc`) reuses it.

Behavioral parity: ``blackjax/mcmc/laplace_hmc.py`` (warm-start threading
:14-40, kernel :120).
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

__all__ = [
    "LaplaceHMCState",
    "LaplaceHMCInfo",
    "init",
    "build_kernel",
    "as_top_level_api",
    "run_warm_started",
]


class LaplaceHMCState(NamedTuple):
    """Hyperparameter chain state plus the latent MAP carried as the
    warm-start hint for the next inner solves."""

    position: ArrayTree
    logdensity: float
    logdensity_grad: ArrayTree
    theta_star: ArrayTree


def init(position: ArrayLikeTree, laplace: LaplaceMarginal) -> LaplaceHMCState:
    grad_with_mode = jax.value_and_grad(laplace, has_aux=True)
    (logdensity, theta_star), logdensity_grad = grad_with_mode(position)
    return LaplaceHMCState(position, logdensity, logdensity_grad, theta_star)


def run_warm_started(laplace: LaplaceMarginal, theta_prev: ArrayTree, inner_step):
    """Shared Laplace-marginal transition pattern.

    ``inner_step(logdensity_fn) -> (inner_state, hmc_info)`` runs one
    HMC-family transition against the marginal with the warm start frozen
    at ``theta_prev``.  Afterwards the latent MAP is re-solved once at the
    landing position (surfacing the L-BFGS diagnostics) and becomes the
    next warm start.  Returns ``(inner_state, theta_star, info)``.
    """

    def marginal_logdensity(phi):
        value, _ = laplace(phi, theta_prev)
        return value

    moved, hmc_info = inner_step(marginal_logdensity)
    theta_star, solver = laplace.solve_theta_with_info(moved.position, theta_prev)
    info = LaplaceHMCInfo(
        *hmc_info,
        solver.iter_num,
        solver.error,
        solver.converged,
        solver.hit_maxiter,
    )
    return moved, theta_star, info


def build_kernel(
    integrator: Callable = integrators.velocity_verlet,
    divergence_threshold: float = 1000,
    build_proposal: Callable = hmc.hmc_proposal,
) -> Callable:
    """Laplace-HMC kernel: static-length HMC through the warm-started
    marginal."""
    hmc_kernel = hmc.build_kernel(integrator, divergence_threshold, build_proposal)

    def kernel(
        rng_key: PRNGKey, state: LaplaceHMCState, laplace: LaplaceMarginal,
        step_size: float, inverse_mass_matrix: metrics.MetricTypes,
        num_integration_steps: int,
    ) -> tuple[LaplaceHMCState, LaplaceHMCInfo]:
        def inner_step(logdensity_fn):
            chain = hmc.HMCState(state.position, state.logdensity, state.logdensity_grad)
            return hmc_kernel(
                rng_key, chain, logdensity_fn, step_size, inverse_mass_matrix,
                num_integration_steps,
            )

        moved, theta_star, info = run_warm_started(
            laplace, state.theta_star, inner_step
        )
        return (
            LaplaceHMCState(
                moved.position, moved.logdensity, moved.logdensity_grad, theta_star
            ),
            info,
        )

    return kernel


def as_top_level_api(
    log_joint_fn: Callable, theta_init: ArrayLikeTree, step_size: float,
    inverse_mass_matrix: metrics.MetricTypes, num_integration_steps: int, *,
    divergence_threshold: int = 1000,
    integrator: Callable = integrators.velocity_verlet,
    build_proposal: Callable = hmc.hmc_proposal, **optimizer_kwargs,
) -> SamplingAlgorithm:
    """``blackjax_tpu.laplace_hmc(...)``: HMC over hyperparameters ``phi``
    of ``log_joint_fn(theta, phi)`` with the latent ``theta`` integrated out
    by Laplace."""
    laplace = laplace_marginal_factory(log_joint_fn, theta_init, **optimizer_kwargs)
    kernel = build_kernel(integrator, divergence_threshold, build_proposal)
    return build_sampling_algorithm(
        kernel, init, laplace,
        kernel_args=(step_size, inverse_mass_matrix, num_integration_steps),
    )
