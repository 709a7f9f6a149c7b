"""Optimizer tests: dual averaging convergence, L-BFGS path recording, the
Pathfinder inverse-Hessian factor identities, and alpha recovery.

Parity model: reference ``tests/optimizers/test_optimizers.py``.
"""
import functools

import jax
import jax.numpy as jnp
import jax.scipy.stats as stats
import numpy as np
from jax.flatten_util import ravel_pytree

from blackjax_tpu.optimizers.dual_averaging import dual_averaging
from blackjax_tpu.optimizers.lbfgs import (
    lbfgs_inverse_hessian_factors,
    lbfgs_inverse_hessian_formula_1,
    lbfgs_inverse_hessian_formula_2,
    lbfgs_recover_alpha,
    minimize_lbfgs,
)


def test_dual_averaging_drives_gradient_to_zero():
    f = lambda x: (x - 1) ** 2
    grad_f = jax.jit(jax.grad(f))
    init, update, final = dual_averaging(gamma=0.3)
    state = init(3.0)
    for _ in range(100):
        x = jnp.exp(state.log_x)
        state = update(state, grad_f(x))
    assert abs(float(final(state)) - 1.0) < 1e-1


def _regression_posterior(key):
    k0, k1 = jax.random.split(key)
    x_data = jax.random.normal(k0, (10_000, 1))
    y_data = 3 * x_data + jax.random.normal(k1, x_data.shape)

    def logprob(tree):
        log_scale, coefs = tree["log_scale"], tree["coefs"]
        scale = jnp.exp(log_scale)
        scale_prior = stats.expon.logpdf(scale, 0, 1) + log_scale
        coefs_prior = stats.norm.logpdf(coefs, 0, 5)
        y = jnp.dot(x_data, coefs)
        logpdf = stats.norm.logpdf(y_data, y, scale)
        return scale_prior + jnp.sum(coefs_prior) + jnp.sum(logpdf)

    return logprob


def test_minimize_lbfgs_history_identities(rng_key):
    """alpha recovery replays the recorded history; the two Pathfinder
    inverse-Hessian formulas (II.1/II.3) agree on H^{-1} g."""
    maxiter, maxcor = 10, 6
    logprob = _regression_posterior(rng_key)
    b0 = {"log_scale": 0.0, "coefs": 2.0}
    b0_flat, unravel = ravel_pytree(b0)
    objective = lambda x: -logprob(unravel(x))

    (_, status), history = jax.jit(
        functools.partial(minimize_lbfgs, objective, maxiter=maxiter, maxcor=maxcor)
    )(b0_flat)
    n = int(status.iter_num) + 1
    history = jax.tree.map(lambda x: x[:n], history)

    S = jnp.diff(history.x, axis=0)
    Z = jnp.diff(history.g, axis=0)

    def scan_fn(alpha, val):
        alpha_l, mask_l = lbfgs_recover_alpha(alpha, *val)
        return alpha_l, (alpha_l, mask_l)

    _, (alpha, mask) = jax.lax.scan(scan_fn, history.alpha[0], (S, Z))
    np.testing.assert_allclose(
        np.asarray(alpha), np.asarray(history.alpha[1:]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(history.update_mask[1:]))

    S_partial, Z_partial = S[-maxcor:].T, Z[-maxcor:].T
    alpha_last = history.alpha[-1]
    beta, gamma = lbfgs_inverse_hessian_factors(S_partial, Z_partial, alpha_last)
    h1 = lbfgs_inverse_hessian_formula_1(alpha_last, beta, gamma)
    h2 = lbfgs_inverse_hessian_formula_2(alpha_last, beta, gamma)
    np.testing.assert_allclose(
        np.asarray(h1 @ history.g[-1]), np.asarray(h2 @ history.g[-1]), atol=1e-3
    )


def test_recover_diag_inv_hessian(rng_key):
    """On a quadratic with diagonal Hessian diag(1/a), the recovered alpha
    approaches a (the true inverse Hessian diagonal)."""
    a = jnp.array([2.0, 5.0])
    quad = lambda x: 0.5 * jnp.sum(x**2 / a)
    x0 = jnp.array([3.0, -4.0])
    (_, status), history = minimize_lbfgs(quad, x0, maxiter=20, maxcor=6)
    n = int(status.iter_num) + 1
    alpha_final = np.asarray(history.alpha[n - 1])
    np.testing.assert_allclose(alpha_final, np.asarray(a), rtol=0.3)
