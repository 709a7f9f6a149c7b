"""Adjoint-differentiated Laplace marginal log-density (Margossian et al.
2020/2023): integrate out latent Gaussian variables by a Laplace
approximation whose hyperparameter gradients come from the implicit function
theorem rather than from unrolling the inner L-BFGS solve.

Behavioral parity target: ``blackjax/mcmc/laplace_marginal.py``
(``laplace_marginal_factory`` :216; five-callable bundle).

Mechanically this differs from the reference: the mode solve is wrapped in a
``jax.custom_vjp`` whose backward pass solves one SPD system with the
curvature's Cholesky factor and closes with a vector-Jacobian product against
the *score* function (no dense cross-Jacobian, no ``lax.custom_root``
linearized-residual solve).  The same Cholesky factor of the negative
Hessian serves the log-determinant and the conditional Gaussian sampler.
"""
import dataclasses
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree
from jax.scipy.linalg import solve_triangular

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
    inside the implicit-gradient mode solve are not observable; the
    warm-started refresh count is the proxy)."""
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
    - 1/2 log|-H| + d/2 log 2pi``.  The curvature is dense (O(d^2) memory,
    one O(d^3) Cholesky per evaluation); ``theta_prev`` warm-starts the mode
    solve through the chain."""
    flat0, unravel = ravel_pytree(theta_init)
    d = flat0.shape[0]
    maxiter = optimizer_kwargs.get("maxiter", 30)
    gtol = optimizer_kwargs.get("gtol", 1e-8)

    def joint_of_flat(theta_flat, phi):
        return log_joint_fn(unravel(theta_flat), phi)

    def score(theta_flat, phi):
        """Gradient of the joint in the (flat) latents — zero at the mode."""
        return jax.grad(joint_of_flat)(theta_flat, phi)

    def curvature_factor(theta_flat, phi):
        """Cholesky factor of the negative latent Hessian at ``theta_flat``."""
        neg_hessian = -jax.jacfwd(score)(theta_flat, phi)
        return jnp.linalg.cholesky(neg_hessian)

    def solve_theta_with_info(
        phi: ArrayLikeTree, theta_prev: Optional[ArrayTree] = None
    ) -> tuple[ArrayTree, LBFGSDiagnostics]:
        start = theta_init if theta_prev is None else theta_prev
        result, _ = minimize_lbfgs(
            lambda theta: -log_joint_fn(theta, phi), start, **optimizer_kwargs
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

    # -- implicit-gradient mode solve -------------------------------------
    # Forward: run L-BFGS, ignore differentiation.  Backward: at the mode,
    # score(theta*, phi) == 0, so the IFT gives
    #     d theta* / d phi = N^{-1} (d score / d phi),     N = -H_theta
    # and a cotangent ct pulls back as  (N^{-1} ct)^T (d score / d phi),
    # i.e. one SPD solve followed by a VJP against the score in phi.

    @jax.custom_vjp
    def _mode(phi, theta_prev_flat):
        theta = solve_theta(phi, unravel(theta_prev_flat))
        return ravel_pytree(theta)[0]

    def _mode_fwd(phi, theta_prev_flat):
        theta_flat = _mode(phi, theta_prev_flat)
        return theta_flat, (theta_flat, phi)

    def _mode_bwd(residuals, cotangent):
        theta_flat, phi = residuals
        chol = curvature_factor(theta_flat, phi)
        half = solve_triangular(chol, cotangent, lower=True)
        v = solve_triangular(chol.T, half, lower=False)
        _, pullback = jax.vjp(lambda p: score(theta_flat, p), phi)
        (phi_bar,) = pullback(v)
        # the warm start steers the solver, not the solution: zero cotangent
        return phi_bar, jnp.zeros(d)

    _mode.defvjp(_mode_fwd, _mode_bwd)

    def get_theta_star(phi, theta_prev=None):
        start = theta_init if theta_prev is None else theta_prev
        return unravel(_mode(phi, ravel_pytree(start)[0]))

    def log_marginal(phi, theta_prev=None):
        theta_star = get_theta_star(phi, theta_prev)
        theta_flat = ravel_pytree(theta_star)[0]
        chol = curvature_factor(theta_flat, phi)
        # log|N| from its factor; 0.5*d*log(2 pi) is the Gaussian integral
        half_logdet = jnp.sum(jnp.log(jnp.diagonal(chol)))
        value = (
            joint_of_flat(theta_flat, phi)
            - half_logdet
            + 0.5 * d * jnp.log(2.0 * jnp.pi)
        )
        return value, theta_star

    def sample_theta(rng_key: PRNGKey, phi, theta_star) -> ArrayTree:
        """theta ~ N(theta*, N^{-1}) by back-substituting white noise through
        the transposed curvature factor."""
        theta_flat = ravel_pytree(theta_star)[0]
        chol = curvature_factor(theta_flat, phi)
        white = jax.random.normal(rng_key, (d,))
        return unravel(theta_flat + solve_triangular(chol.T, white, lower=False))

    return LaplaceMarginal(
        solve_theta=solve_theta,
        solve_theta_with_info=solve_theta_with_info,
        get_theta_star=get_theta_star,
        log_marginal=log_marginal,
        sample_theta=sample_theta,
    )
