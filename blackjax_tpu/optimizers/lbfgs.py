"""L-BFGS with path recording, plus the factored inverse-Hessian algebra
used by Pathfinder (Zhang et al. 2022).

Behavioral parity target: ``blackjax/optimizers/lbfgs.py`` (history-recording
minimizer :115/:198, diagonal recovery :311 [paper Algorithm 3], factored
inverse Hessian :360 [formula II.2], formulas II.1/II.3 :385-395, factored-
Gaussian sampling :412 [Algorithm 4]).

The optimizer itself is optax's L-BFGS with zoom line search, run inside one
``lax.scan`` with a converged-flag no-op guard — a fixed-trip-count loop that
compiles cleanly for TPU and vmaps across multiple starting points
(multi-path Pathfinder).
"""
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.flatten_util import ravel_pytree

from blackjax_tpu.types import Array, ArrayLikeTree

__all__ = [
    "LBFGSHistory",
    "LBFGSDiagnostics",
    "LbfgsState",
    "OptStep",
    "minimize_lbfgs",
    "lbfgs_recover_alpha",
    "lbfgs_inverse_hessian_factors",
    "lbfgs_inverse_hessian_formula_1",
    "lbfgs_inverse_hessian_formula_2",
    "bfgs_sample",
]


class LBFGSDiagnostics(NamedTuple):
    """Convergence diagnostics of one solve; ``hit_maxiter`` is the
    actionable budget-exhausted signal."""

    iter_num: Array
    error: Array
    converged: Array
    hit_maxiter: Array


class LBFGSHistory(NamedTuple):
    """The optimization path: iterates, objective values, gradients, the
    running diagonal inverse-Hessian estimate, and the per-step mask of
    whether the (s, z) pair passed the curvature condition."""

    x: Array
    f: Array
    g: Array
    alpha: Array
    update_mask: Array


class LbfgsState(NamedTuple):
    iter_num: Array
    value: Array
    grad: Array
    error: Array
    s_history: Array
    y_history: Array
    rho_history: Array
    gamma: Array
    stepsize: Array
    aux: Any


class OptStep(NamedTuple):
    params: Any
    state: LbfgsState


def minimize_lbfgs(
    fun: Callable,
    x0: ArrayLikeTree,
    maxiter: int = 30,
    maxcor: int = 10,
    gtol: float = 1e-08,
    ftol: float = 1e-05,
    maxls: int = 1000,
    **lbfgs_kwargs,
) -> tuple[OptStep, LBFGSHistory]:
    """Minimize ``fun`` from ``x0`` (any pytree), recording the whole path.
    Returns ``(OptStep, LBFGSHistory)`` with histories of length
    ``maxiter + 1`` (initial point included); entries after convergence
    repeat the converged iterate."""
    flat_x0, unravel = ravel_pytree(x0)
    batched_unravel = jax.vmap(unravel)

    step, history = _minimize_lbfgs_flat(
        lambda x: fun(unravel(x)), flat_x0, maxiter, maxcor, gtol, ftol, maxls
    )

    step = OptStep(
        params=unravel(step.params),
        state=step.state._replace(
            grad=unravel(step.state.grad),
            s_history=batched_unravel(step.state.s_history),
            y_history=batched_unravel(step.state.y_history),
        ),
    )
    history = LBFGSHistory(
        x=batched_unravel(history.x),
        f=history.f,
        g=batched_unravel(history.g),
        alpha=batched_unravel(history.alpha),
        update_mask=jax.tree.map(
            lambda m: m.astype(bool),
            batched_unravel(history.update_mask.astype(flat_x0.dtype)),
        ),
    )
    return step, history


def _minimize_lbfgs_flat(fun, x0, maxiter, maxcor, gtol, ftol, maxls):
    linesearch = optax.scale_by_zoom_linesearch(max_linesearch_steps=maxls)
    solver = optax.lbfgs(memory_size=maxcor, linesearch=linesearch)
    cached_value_and_grad = optax.value_and_grad_from_state(fun)

    opt_state = solver.init(x0)
    f0, g0 = jax.value_and_grad(fun)(x0)
    history0 = LBFGSHistory(
        x=x0,
        f=f0,
        g=g0,
        alpha=jnp.ones_like(x0),
        update_mask=jnp.zeros_like(x0, dtype=bool),
    )

    def advance(carry, i):
        (params, state), prev_history = carry
        value, grad = cached_value_and_grad(params, state=state)
        updates, new_state = solver.update(
            grad, state, params, value=value, grad=grad, value_fn=fun
        )
        new_params = optax.apply_updates(params, updates)
        new_value, new_grad = jax.value_and_grad(fun)(new_params)

        # position / gradient deltas of THIS step (optax's own memory lags by
        # one), feeding the streaming diagonal inverse-Hessian recovery
        s = new_params - params
        z = new_grad - grad
        alpha, mask = lbfgs_recover_alpha(prev_history.alpha, s, z)

        history = LBFGSHistory(new_params, new_value, new_grad, alpha, mask)
        rel_drop = jnp.abs(value - new_value) / jnp.maximum(
            jnp.maximum(jnp.abs(value), jnp.abs(new_value)), 1.0
        )
        keep_going = (jnp.linalg.norm(grad) > gtol) & (rel_drop > ftol) & (i < maxiter)
        return ((new_params, new_state), history), keep_going

    def halt(carry, i):
        return carry, False

    def scan_body(carry_and_flag, i):
        carry, keep_going = carry_and_flag
        out = lax.cond(keep_going, advance, halt, carry, i)
        return out, out[0][1]

    init = (((x0, opt_state), history0), True)
    (((last_params, last_opt_state), _), _), history = lax.scan(
        scan_body, init, jnp.arange(maxiter)
    )
    history = jax.tree.map(
        lambda first, rest: jnp.concatenate([first[None], rest], axis=0),
        history0,
        history,
    )

    inner = last_opt_state[0]  # optax ScaleByLBFGSState
    last_idx = (inner.count - 1) % maxcor
    s_last = inner.diff_params_memory[last_idx]
    y_last = inner.diff_updates_memory[last_idx]
    sy = jnp.dot(s_last, y_last)
    gamma = jnp.where(sy > 0, sy / jnp.dot(y_last, y_last), 1.0)

    state = LbfgsState(
        iter_num=inner.count,
        value=history.f[-1],
        grad=history.g[-1],
        error=jnp.linalg.norm(history.g[-1]),
        s_history=inner.diff_params_memory,
        y_history=inner.diff_updates_memory,
        rho_history=inner.weights_memory,
        gamma=gamma,
        stepsize=jnp.array(1.0),
        aux=None,
    )
    return OptStep(params=last_params, state=state), history


def lbfgs_recover_alpha(alpha_prev, s, z, epsilon=1e-12):
    """Streaming diagonal inverse-Hessian estimate (Pathfinder Algorithm 3
    inner loop). The pair is used only when the curvature condition
    ``s.z > eps * ||z||`` holds; otherwise the previous diagonal carries
    over (mask False)."""

    def updated(alpha):
        a = jnp.sum(alpha * z**2)
        b = jnp.dot(z, s)
        c = jnp.sum(s**2 / alpha)
        inv_alpha = a / (b * alpha) + z**2 / b - (a * s**2) / (b * c * alpha**2)
        return 1.0 / inv_alpha

    accept = jnp.dot(s, z) > epsilon * jnp.linalg.norm(z)
    alpha = lax.cond(accept, updated, lambda a: a, alpha_prev)
    mask = jnp.full_like(alpha_prev, accept, dtype=bool)
    return alpha, mask


def lbfgs_inverse_hessian_factors(S, Z, alpha):
    """Factored inverse Hessian ``H^-1 = diag(alpha) + beta gamma beta^T``
    (Pathfinder formula II.2) from position deltas ``S (m, d)->(d, m)``
    layout (d, m), gradient deltas ``Z`` and the diagonal ``alpha``."""
    m = S.shape[-1]
    StZ = S.T @ Z
    R = jnp.triu(StZ) + jnp.eye(m) * jnp.finfo(S.dtype).eps
    eta = jnp.diag(StZ)

    beta = jnp.hstack((alpha[:, None] * Z, S))
    neg_Rinv = -jnp.linalg.inv(R)
    sqrt_alpha_Z = jnp.sqrt(alpha)[:, None] * Z
    lower_right = neg_Rinv.T @ (sqrt_alpha_Z.T @ sqrt_alpha_Z + jnp.diag(eta)) @ neg_Rinv
    gamma = jnp.block([[jnp.zeros((m, m)), neg_Rinv], [neg_Rinv.T, lower_right]])
    return beta, gamma


def lbfgs_inverse_hessian_formula_1(alpha, beta, gamma):
    """Dense ``H^-1`` (formula II.1)."""
    return jnp.diag(alpha) + beta @ gamma @ beta.T


def lbfgs_inverse_hessian_formula_2(alpha, beta, gamma):
    """Dense ``H^-1`` in the symmetric sqrt-alpha form (formula II.3)."""
    d = alpha.shape[0]
    sqrt_a = jnp.diag(jnp.sqrt(alpha))
    inv_sqrt_a = jnp.diag(1.0 / jnp.sqrt(alpha))
    return sqrt_a @ (jnp.eye(d) + inv_sqrt_a @ beta @ gamma @ beta.T @ inv_sqrt_a) @ sqrt_a


def bfgs_sample(rng_key, num_samples, position, grad_position, alpha, beta, gamma):
    """Sample from the factored Gaussian ``N(mu, H^-1)`` with
    ``mu = x + H^-1 g`` (Pathfinder Algorithm 4). Returns
    ``(samples, their log-densities under the approximation)``."""
    if not isinstance(num_samples, tuple):
        num_samples = (num_samples,)

    Q, R = jnp.linalg.qr(beta / jnp.sqrt(alpha)[:, None], mode="reduced")
    d = beta.shape[0]
    identity = jnp.identity(R.shape[0])
    L = jnp.linalg.cholesky(identity + R @ gamma @ R.T)

    logdet = jnp.sum(jnp.log(alpha)) + 2.0 * jnp.sum(jnp.log(jnp.diagonal(L)))
    mu = position + alpha * grad_position + beta @ (gamma @ (beta.T @ grad_position))

    u = jax.random.normal(rng_key, num_samples + (d, 1))
    phi = mu[..., None] + jnp.sqrt(alpha)[:, None] * (Q @ (L - identity) @ (Q.T @ u) + u)
    logdensity = -0.5 * (
        logdet + jnp.einsum("...ji,...ji->...", u, u) + d * jnp.log(2.0 * jnp.pi)
    )
    return phi[..., 0], logdensity
