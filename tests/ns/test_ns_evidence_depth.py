"""Evidence-estimator statistical depth for nested sampling.

Mirrors the reference's quantitative evidence tiers
(``tests/ns/test_nested_sampling.py:410-652``): the stochastic
volume-shrinkage estimator must be statistically consistent with an
ANALYTIC evidence on synthetic dead-point data (where NS's only error
source is the X-path Monte Carlo), and its error must shrink with the
live-set size at the Skilling rate ~ sqrt(H / n_live).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import norm

from blackjax_tpu.ns import utils as ns_utils
from blackjax_tpu.ns.base import NSInfo, StateWithLogLikelihood


def _mock_dead_info(positions, loglik, logprior, birth=None):
    n = loglik.shape[0]
    if birth is None:
        birth = jnp.full((n,), -jnp.inf)
    particles = StateWithLogLikelihood(
        position=positions,
        logdensity=logprior,
        loglikelihood=loglik,
        loglikelihood_birth=birth,
    )
    return NSInfo(particles=particles, update_info=None)


def test_log_weights_consistent_with_analytic_1d_evidence(rng_key):
    """Uniform prior on [-3, 3], unnormalized Gaussian likelihood
    exp(-x^2/2): Z = sqrt(2 pi) (Phi(3) - Phi(-3)) / 6. With a dense
    deterministic dead set the only stochasticity is the X path, so the
    mean estimate must sit within 2 sigma of the analytic value
    (reference protocol, ``test_1d_gaussian_evidence_estimation``)."""
    a, b = -3.0, 3.0
    true_logz = float(
        np.log(np.sqrt(2 * np.pi) * (norm.cdf(3.0) - norm.cdf(-3.0)) / (b - a))
    )

    n_dead = 240
    x = jnp.linspace(a + 0.01, b - 0.01, n_dead)[:, None]
    loglik = -0.5 * x[:, 0] ** 2
    logprior = jnp.full((n_dead,), -jnp.log(b - a))
    order = jnp.argsort(loglik)
    info = _mock_dead_info(x[order], loglik[order], logprior[order])

    # log_weights vectorizes the X-path replicas natively via ``shape``
    # (compute_num_live's boolean indexing is trace-incompatible, so no
    # jit/vmap here — one eager call)
    lw = ns_utils.log_weights(rng_key, info, shape=3200)
    logz = np.asarray(jax.scipy.special.logsumexp(lw, axis=0)).ravel()
    assert np.isfinite(logz).all()
    mean, std = logz.mean(), logz.std()
    assert abs(mean - true_logz) < 2.0 * std, (mean, true_logz, std)
    assert abs(mean - true_logz) < 0.5  # and in the right ballpark outright


@pytest.mark.slow
def test_evidence_error_shrinks_with_live_set(rng_key):
    """Skilling: var(log Z) ~ H / n_live. Doubling the live count must
    shrink the X-path standard deviation by ~sqrt(2) (checked loosely:
    strictly smaller, and within [1.1, 2.0] of the ratio). The two runs
    sample the SAME likelihood-vs-volume profile L(X) = exp(-20 X) (logZ
    = log((1 - e^-20)/20)), with the dead count scaled to the live count
    so both cover logX down to -12."""

    def estimate_std(n_live, key):
        n_dead = 12 * n_live
        X = jnp.exp(-jnp.arange(n_dead) / n_live)  # expected volume path
        loglik = -20.0 * X  # ascending in i, as NS produces
        # staged births: particle i is born at the death contour of
        # particle i - n_live, so compute_num_live sees a constant
        # n_live-point live set (the estimator reads only the event stream)
        birth = jnp.full((n_dead,), -jnp.inf)
        birth = birth.at[n_live:].set(loglik[:-n_live])
        info = _mock_dead_info(
            jnp.zeros((n_dead, 1)), loglik, jnp.zeros((n_dead,)), birth
        )
        lw = ns_utils.log_weights(key, info, shape=1200)
        vals = np.asarray(jax.scipy.special.logsumexp(lw, axis=0)).ravel()
        true_logz = float(np.log((1.0 - np.exp(-20.0)) / 20.0))
        assert abs(vals.mean() - true_logz) < 4.0 * vals.std() / np.sqrt(1.0) + 0.1
        return vals.std()

    k1, k2 = jax.random.split(rng_key)
    std_small = estimate_std(50, k1)
    std_big = estimate_std(100, k2)
    ratio = std_small / std_big
    assert std_big < std_small, (std_small, std_big)
    assert 1.1 < ratio < 2.0, ratio


def test_log_weights_beta_tempering_scales_likelihood(rng_key):
    """``beta`` tempers the likelihood term only: at beta=0 the weights
    integrate the prior volume (Z = 1 for a unit prior), independent of
    the likelihood values."""
    n = 120
    loglik = jnp.sort(jax.random.normal(rng_key, (n,)))
    info = _mock_dead_info(
        jnp.zeros((n, 1)), loglik, jnp.zeros((n,))
    )
    lw0 = ns_utils.log_weights(jax.random.fold_in(rng_key, 1), info, shape=64, beta=0.0)
    logz0 = np.asarray(jax.scipy.special.logsumexp(lw0, axis=0))
    # integrating dX alone recovers the full unit prior volume up to the
    # truncation tail of the X path
    np.testing.assert_allclose(np.exp(logz0).mean(), 1.0, atol=0.1)

    # beta=1 equals adding loglik to the beta=0 weights under the SAME key
    k = jax.random.fold_in(rng_key, 2)
    lw0b = ns_utils.log_weights(k, info, shape=16, beta=0.0)
    lw1 = ns_utils.log_weights(k, info, shape=16, beta=1.0)
    np.testing.assert_allclose(
        np.asarray(lw1), np.asarray(lw0b + loglik[:, None]), rtol=1e-6
    )
