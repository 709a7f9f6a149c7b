"""Adjoint-differentiated Laplace marginal log-density (Margossian et al.
2020/2023): integrate out latent Gaussian variables by a Laplace
approximation whose gradients flow through the implicit function theorem
(``jax.lax.custom_root``) instead of unrolling the inner L-BFGS solve.

Behavioral parity target: ``blackjax/mcmc/laplace_marginal.py``
(``laplace_marginal_factory`` :216; five-callable bundle).
"""
import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from blackjax_tpu.optimizers.lbfgs import LBFGSDiagnostics, minimize_lbfgs
from blackjax_tpu.types import Array, ArrayLikeTree, ArrayTree, PRNGKey

__all__ = [
    "LaplaceHMCInfo",
    "LaplaceMarginal",
    "laplace_marginal_factory",
    "laplace_lbfgs_grad_evals",
]


class LaplaceHMCInfo(NamedTuple):
    """HMCInfo fields plus L-BFGS diagnostics of the post-accept theta*
    refresh; ``lbfgs_hit_maxiter`` is the silent-non-convergence alarm."""

    momentum: ArrayTree
    acceptance_rate: float
    is_accepted: bool
    is_divergent: bool
    energy: float
    proposal: Any
    num_integration_steps: int
    lbfgs_iter_num: Array
    lbfgs_error: Array
    lbfgs_converged: Array
    lbfgs_hit_maxiter: Array


def laplace_lbfgs_grad_evals(info: LaplaceHMCInfo) -> Array:
    """Estimated inner L-BFGS gradient evaluations per kernel step:
    ``(num_integration_steps + 1) * lbfgs_iter_num`` (the interior solves
    inside custom_root are not observable; the warm-started refresh count is
    the proxy)."""
    return (info.num_integration_steps + 1) * info.lbfgs_iter_num


@dataclasses.dataclass
class LaplaceMarginal:
    """Named bundle of pure functions over the Laplace marginal; callable as
    ``log_marginal`` (compatible with ``value_and_grad(..., has_aux=True)``)."""

    solve_theta: Callable
    solve_theta_with_info: Callable
    get_theta_star: Callable
    log_marginal: Callable
    sample_theta: Callable

    def __call__(self, phi, theta_prev=None):
        return self.log_marginal(phi, theta_prev)


def laplace_marginal_factory(
    log_joint_fn: Callable,
    theta_init: ArrayLikeTree,
    **optimizer_kwargs,
) -> LaplaceMarginal:
    """Build the Laplace marginal ``log p(phi | y) ~ log p(theta*, phi, y)
    - 1/2 log|-H| + d/2 log 2pi`` with IFT gradients. The Hessian is dense
    (O(d^2) memory, O(d^3) log-det); ``theta_prev`` warm-starts the mode
    solve through the chain."""
    theta_flat_init, unravel_theta = ravel_pytree(theta_init)
    d = theta_flat_init.shape[0]
    maxiter = optimizer_kwargs.get("maxiter", 30)
    gtol = optimizer_kwargs.get("gtol", 1e-8)

    def solve_theta_with_info(
        phi: ArrayLikeTree, theta_prev: Optional[ArrayTree] = None
    ) -> tuple[ArrayTree, LBFGSDiagnostics]:
        initial = theta_prev if theta_prev is not None else theta_init
        result, _ = minimize_lbfgs(
            lambda theta: -log_joint_fn(theta, phi), initial, **optimizer_kwargs
        )
        diagnostics = LBFGSDiagnostics(
            iter_num=result.state.iter_num,
            error=result.state.error,
            converged=result.state.error <= gtol,
            hit_maxiter=result.state.iter_num >= maxiter,
        )
        return result.params, diagnostics

    def solve_theta(phi, theta_prev=None):
        return solve_theta_with_info(phi, theta_prev)[0]

    def get_theta_star(phi, theta_prev=None):
        """Mode solve wrapped in custom_root so d(theta*)/d(phi) comes from
        the implicit function theorem."""

        def residual(theta_flat):
            grad = jax.grad(log_joint_fn, argnums=0)(unravel_theta(theta_flat), phi)
            return ravel_pytree(grad)[0]

        def solve_root(f, x0):
            del f
            return ravel_pytree(solve_theta(phi, theta_prev))[0]

        def tangent_solve(g, y):
            J = jax.jacobian(g)(jnp.zeros_like(theta_flat_init))
            return jnp.linalg.solve(J, y)

        theta_flat_star = jax.lax.custom_root(
            residual, theta_flat_init, solve_root, tangent_solve
        )
        return unravel_theta(theta_flat_star)

    def log_marginal(phi, theta_prev=None):
        theta_star = get_theta_star(phi, theta_prev)
        theta_flat_star, _ = ravel_pytree(theta_star)

        def log_joint_flat(t_flat):
            return log_joint_fn(unravel_theta(t_flat), phi)

        log_p_star = log_joint_flat(theta_flat_star)
        neg_hess = jax.hessian(lambda t: -log_joint_flat(t))(theta_flat_star)
        _, log_abs_det = jnp.linalg.slogdet(neg_hess)
        return log_p_star - 0.5 * log_abs_det + 0.5 * d * jnp.log(2.0 * jnp.pi), theta_star

    def sample_theta(rng_key: PRNGKey, phi, theta_star) -> ArrayTree:
        """theta ~ N(theta*, H^{-1}) via the Hessian Cholesky."""
        theta_flat_star, _ = ravel_pytree(theta_star)

        def log_joint_flat(t_flat):
            return log_joint_fn(unravel_theta(t_flat), phi)

        neg_hess = jax.hessian(lambda t: -log_joint_flat(t))(theta_flat_star)
        L = jnp.linalg.cholesky(neg_hess)
        z = jax.random.normal(rng_key, (d,))
        x_flat = jax.lax.linalg.triangular_solve(
            L, z, left_side=True, lower=True, transpose_a=True
        )
        return unravel_theta(theta_flat_star + x_flat)

    return LaplaceMarginal(
        solve_theta=solve_theta,
        solve_theta_with_info=solve_theta_with_info,
        get_theta_star=get_theta_star,
        log_marginal=log_marginal,
        sample_theta=sample_theta,
    )
