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


def test_bfgs_sample_logdet_stable_for_huge_dimension():
    """The log-determinant must be computed as sum(log(alpha)), not
    log(prod(alpha)): at N=3000 with alpha=2 the product overflows any float
    while the log-density must stay finite."""
    from blackjax_tpu.optimizers.lbfgs import bfgs_sample

    N = 3000
    alpha = 2.0 * jnp.ones(N)
    _, logq = bfgs_sample(
        jax.random.key(0),
        1,
        jnp.zeros(N),
        jnp.zeros(N),
        alpha,
        jnp.zeros((N, 2)),
        jnp.zeros((2, 2)),
    )
    assert np.all(np.isfinite(np.asarray(logq)))


def test_bfgs_sample_mean_matches_dense_form(rng_key):
    """The factored mean x + alpha*g + beta(gamma(beta^T g)) must equal the
    dense diag(alpha)-based expression; recover mu by reproducing the noise
    tensor from the same key."""
    from blackjax_tpu.optimizers.lbfgs import bfgs_sample

    N, J = 50, 5
    k0, k1, k3, k4, k5 = jax.random.split(rng_key, 5)
    alpha = jnp.abs(jax.random.normal(k0, (N,))) + 0.5
    S = jax.random.normal(k1, (N, J))
    beta, gamma = lbfgs_inverse_hessian_factors(S, S, alpha)  # s^T z > 0
    position = jax.random.normal(k3, (N,))
    grad_position = jax.random.normal(k4, (N,))

    num_samples = 4
    phi, _ = bfgs_sample(k5, num_samples, position, grad_position, alpha, beta, gamma)

    u = jax.random.normal(k5, (num_samples, N, 1))
    Q, R = jnp.linalg.qr(beta / jnp.sqrt(alpha)[:, None], mode="reduced")
    identity = jnp.identity(R.shape[0])
    L = jnp.linalg.cholesky(identity + R @ gamma @ R.T)
    noise = jnp.sqrt(alpha)[:, None] * (Q @ (L - identity) @ (Q.T @ u) + u)
    mu_from_phi = np.asarray(phi - noise[..., 0])

    mu_dense = np.asarray(
        position
        + jnp.diag(alpha) @ grad_position
        + beta @ gamma @ beta.T @ grad_position
    )
    rtol = 1e-8 if jax.config.jax_enable_x64 else 1e-3
    for row in mu_from_phi:
        np.testing.assert_allclose(row, mu_dense, rtol=rtol, atol=1e-3)
