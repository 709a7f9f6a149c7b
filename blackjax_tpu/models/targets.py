"""Benchmark / test posteriors with known structure.

These are the registered targets used by the benchmark harness and tests
(the reference keeps equivalents inline in its test-suite, e.g.
``tests/mcmc/test_sampling.py:96,483``). All are written flat-array-first:
``logdensity_fn`` takes a flat ``(d,)`` vector so the whole sampler state is
one ``(chains, d)`` HBM-resident array on TPU.
"""
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class Target(NamedTuple):
    """A named log-density with dimension and (when known) posterior moments."""

    logdensity_fn: Callable
    dim: int
    name: str
    mean: jnp.ndarray | None = None
    std: jnp.ndarray | None = None

    def sample_init(self, rng_key, num_chains=None):
        shape = (self.dim,) if num_chains is None else (num_chains, self.dim)
        return 2.0 * jax.random.normal(rng_key, shape)


def standard_normal(dim: int = 10) -> Target:
    def logdensity_fn(x):
        return -0.5 * jnp.sum(x**2)

    return Target(logdensity_fn, dim, f"std_normal_{dim}", jnp.zeros(dim), jnp.ones(dim))


def ill_conditioned_gaussian(dim: int = 100, condition_number: float = 100.0) -> Target:
    """Diagonal Gaussian with eigenvalues log-spaced over the condition
    number — the classic preconditioning stress test."""
    variances = jnp.logspace(
        -0.5 * jnp.log10(condition_number), 0.5 * jnp.log10(condition_number), dim
    )

    def logdensity_fn(x):
        return -0.5 * jnp.sum(x**2 / variances)

    return Target(
        logdensity_fn,
        dim,
        f"ill_cond_gaussian_{dim}",
        jnp.zeros(dim),
        jnp.sqrt(variances),
    )


def hierarchical_gaussian(dim: int = 100) -> Target:
    """The flagship benchmark posterior: a funnel-like hierarchical Gaussian.

    ``x = (log_tau, theta_1..theta_{d-1})`` with
    ``log_tau ~ N(0, 1)`` and ``theta_i | tau ~ N(0, tau^2)`` where
    ``tau = exp(log_tau / 2)`` — a mild Neal's-funnel geometry in ``dim``
    dimensions, matching the "100-dim hierarchical posterior" of the
    benchmark target (BASELINE.json).
    """

    def logdensity_fn(x):
        log_tau = x[..., 0]
        theta = x[..., 1:]
        lp_tau = -0.5 * log_tau**2
        lp_theta = -0.5 * jnp.sum(theta**2, axis=-1) * jnp.exp(-log_tau) - 0.5 * (
            dim - 1
        ) * log_tau
        return lp_tau + lp_theta

    return Target(logdensity_fn, dim, f"hierarchical_gaussian_{dim}")


def eight_schools_noncentered() -> Target:
    """Non-centered eight-schools: x = (mu, log_tau, z_1..z_8), d=10."""
    y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
    sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])

    def logdensity_fn(x):
        mu, log_tau, z = x[..., 0], x[..., 1], x[..., 2:]
        tau = jnp.exp(log_tau)
        theta = mu + tau * z
        lp = -0.5 * (mu / 5.0) ** 2
        lp += -0.5 * (log_tau / 5.0) ** 2
        lp += -0.5 * jnp.sum(z**2, axis=-1)
        lp += jnp.sum(-0.5 * ((y - theta) / sigma) ** 2, axis=-1)
        return lp

    return Target(logdensity_fn, 10, "eight_schools")


def finnish_horseshoe(
    num_points: int = 100,
    num_predictors: int = 200,
    expected_nonzero: int = 10,
    slab_scale: float = 3.0,
    slab_df: float = 25.0,
    seed: int = 42,
) -> Target:
    """Regularized ("Finnish") horseshoe sparse regression, Piironen &
    Vehtari (2017) — the reference's heaviest benchmark posterior
    (``tests/test_benchmarks.py:65-165``).

    Flat-array-first like every house target. Unconstrained layout
    ``x = (alpha, log_sigma, log_tau, log_c2, log_lambda[M], beta_tilde[M])``
    so ``dim = 4 + 2*M``; positive parameters ride in log space with the
    Jacobian folded into the log-density. Normalization constants are
    dropped (house convention).
    """
    import numpy as np

    M, N = num_predictors, num_points
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.standard_normal((N, M)), dtype=jnp.float32)
    truth = np.zeros(M)
    hot = rng.random(M) < 0.05
    truth[hot] = rng.standard_normal(int(hot.sum())) + 10.0
    y = jnp.asarray(X @ truth + rng.standard_normal(N), dtype=jnp.float32)

    # global-scale anchor: tau0 = m0 / ((M - m0) sqrt(N))  (P&V eq. 3.12,
    # absorbed sigma rides separately below)
    tau0 = expected_nonzero / ((M - expected_nonzero) * np.sqrt(N))
    half_df = 0.5 * slab_df
    slab2 = slab_scale**2

    def logdensity_fn(x):
        alpha = x[..., 0]
        log_sigma = x[..., 1]
        log_tau = x[..., 2]
        log_c2 = x[..., 3]
        log_lam = x[..., 4 : 4 + M]
        beta_t = x[..., 4 + M :]

        sigma = jnp.exp(log_sigma)
        tau = tau0 * sigma * jnp.exp(log_tau)
        c2 = slab2 * jnp.exp(log_c2)[..., None]
        lam2 = jnp.exp(2.0 * log_lam)
        # slab-regularized local scales: lam_reg^2 = c2 lam^2/(c2 + tau^2 lam^2)
        lam_reg = jnp.sqrt(c2 * lam2 / (c2 + tau[..., None] ** 2 * lam2))
        beta = tau[..., None] * lam_reg * beta_t

        resid = y - (beta @ X.T + alpha[..., None])
        loglik = -N * log_sigma - 0.5 * jnp.sum(
            (resid / sigma[..., None]) ** 2, axis=-1
        )

        lp = -0.125 * alpha**2  # alpha ~ N(0, 2)
        lp += -0.125 * sigma**2 + log_sigma  # sigma ~ HalfNormal(2), + Jacobian
        lp += -jnp.log1p(jnp.exp(2.0 * log_tau)) + log_tau  # HalfCauchy(1)
        # c2_tilde ~ InvGamma(df/2, df/2): -(a+1) log c - a/c, + Jacobian
        lp += -half_df * log_c2 - half_df * jnp.exp(-log_c2)
        lp += jnp.sum(-jnp.log1p(lam2) + log_lam, axis=-1)  # HalfCauchy(1)
        lp += -0.5 * jnp.sum(beta_t**2, axis=-1)
        return lp + loglik

    return Target(logdensity_fn, 4 + 2 * M, f"finnish_horseshoe_{N}x{M}")


def logistic_regression(
    rng_key=None, num_points: int = 512, dim: int = 25
) -> tuple[Target, jnp.ndarray, jnp.ndarray]:
    """Synthetic logistic regression; returns (target, X, y) so SGMCMC tests
    can minibatch the same data."""
    if rng_key is None:
        rng_key = jax.random.key(0)
    kx, kw, ky = jax.random.split(rng_key, 3)
    X = jax.random.normal(kx, (num_points, dim))
    true_w = jax.random.normal(kw, (dim,))
    logits = X @ true_w
    y = jax.random.bernoulli(ky, jax.nn.sigmoid(logits)).astype(jnp.float32)

    def logdensity_fn(w):
        logits = X @ w
        loglik = jnp.sum(y * jax.nn.log_sigmoid(logits) + (1 - y) * jax.nn.log_sigmoid(-logits))
        return loglik - 0.5 * jnp.sum(w**2)

    return Target(logdensity_fn, dim, f"logreg_{num_points}x{dim}"), X, y
