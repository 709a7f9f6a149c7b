"""Benchmark-tier models and their correctness contracts.

Scenario parity target: ``/root/reference/tests/test_benchmarks.py`` — the
Finnish (regularized) horseshoe regression is the reference's heaviest
benchmark posterior. Fast tests pin the density itself (an independent
distribution-library spelling must differ from the house spelling by a
position-independent constant); the ``benchmark``-marked test runs the
full warmup + sampling loop and asserts mixing floors.
"""
import jax
import jax.numpy as jnp
import jax.scipy.stats as stats
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.diagnostics import effective_sample_size, potential_scale_reduction
from blackjax_tpu.models import finnish_horseshoe
from blackjax_tpu.util import run_inference_algorithm

# small instance for CPU-tier tests; the reference benchmark default is
# N=100, M=200 (d=404)
N, M = 50, 32
TARGET = finnish_horseshoe(num_points=N, num_predictors=M)
D = TARGET.dim


def _independent_spelling():
    """The same posterior written via jax.scipy.stats calls (normalized),
    rebuilt from the SAME data the target closed over (recovered by probing
    the likelihood — no access to the target's internals)."""
    # recover X and y from the registered target? No — rebuild the dataset
    # with the documented construction instead, and verify the recovery via
    # the constant-offset check below (any data mismatch is NOT a constant
    # offset in x, so the test would fail loudly).
    rng = np.random.default_rng(42)
    X = jnp.asarray(rng.standard_normal((N, M)), dtype=jnp.float32)
    truth = np.zeros(M)
    hot = rng.random(M) < 0.05
    truth[hot] = rng.standard_normal(int(hot.sum())) + 10.0
    y = jnp.asarray(X @ truth + rng.standard_normal(N), dtype=jnp.float32)

    m0, slab_scale, slab_df = 10, 3.0, 25.0
    tau0 = m0 / ((M - m0) * np.sqrt(N))
    a = 0.5 * slab_df

    def logdensity(x):
        alpha, log_sigma, log_tau, log_c2 = x[0], x[1], x[2], x[3]
        log_lam, beta_t = x[4 : 4 + M], x[4 + M :]
        sigma = jnp.exp(log_sigma)
        tau_t, c2_t, lam = jnp.exp(log_tau), jnp.exp(log_c2), jnp.exp(log_lam)
        tau = tau0 * sigma * tau_t
        c2 = slab_scale**2 * c2_t
        lam_reg = jnp.sqrt(c2 * lam**2 / (c2 + tau**2 * lam**2))
        beta = tau * lam_reg * beta_t

        lp = stats.norm.logpdf(alpha, 0.0, 2.0)
        # half-normal = 2x the normal density on the half-line
        lp += jnp.log(2.0) + stats.norm.logpdf(sigma, 0.0, 2.0) + log_sigma
        lp += jnp.log(2.0) + stats.cauchy.logpdf(tau_t) + log_tau
        # InvGamma(a, a), normalized
        lp += (
            a * jnp.log(a)
            - jax.scipy.special.gammaln(a)
            - (a + 1.0) * jnp.log(c2_t)
            - a / c2_t
            + log_c2
        )
        lp += jnp.sum(jnp.log(2.0) + stats.cauchy.logpdf(lam) + log_lam)
        lp += jnp.sum(stats.norm.logpdf(beta_t))
        lp += jnp.sum(stats.norm.logpdf(y, X @ beta + alpha, sigma))
        return lp

    return logdensity


def test_horseshoe_density_matches_independent_spelling(rng_key):
    """House (constants-dropped) spelling == normalized jax.scipy.stats
    spelling up to ONE position-independent constant. This pins every
    exponent, Jacobian, and the closed-over dataset at once."""
    other = _independent_spelling()
    xs = 0.3 * jax.random.normal(rng_key, (16, D))
    diff = jax.vmap(TARGET.logdensity_fn)(xs) - jax.vmap(other)(xs)
    # O(1e3) log-densities: f32 rounding alone moves the diff by ~1e-3
    atol = 1e-3 if jax.config.jax_enable_x64 else 3e-2
    np.testing.assert_allclose(diff, diff[0], rtol=0, atol=atol)


def test_horseshoe_finite_and_differentiable(rng_key):
    val, grad = jax.value_and_grad(TARGET.logdensity_fn)(jnp.zeros(D))
    assert jnp.isfinite(val)
    assert jnp.all(jnp.isfinite(grad))
    x = 0.5 * jax.random.normal(rng_key, (D,))
    val, grad = jax.value_and_grad(TARGET.logdensity_fn)(x)
    assert jnp.isfinite(val) and jnp.all(jnp.isfinite(grad))


def test_horseshoe_batch_axis():
    """The flat-first density broadcasts over a leading chains axis."""
    xs = jnp.zeros((3, D))
    batched = TARGET.logdensity_fn(xs)
    assert batched.shape == (3,)
    np.testing.assert_allclose(batched[0], TARGET.logdensity_fn(xs[0]), rtol=1e-6)


@pytest.mark.benchmark
def test_horseshoe_nuts_end_to_end(rng_key):
    """Full pipeline on the small horseshoe: window adaptation -> NUTS ->
    split-Rhat / ESS floors per parameter group (the reference benchmark's
    assertion structure at CPU-tier scale)."""
    warmup_key, sample_key = jax.random.split(rng_key)
    warmup = blackjax_tpu.window_adaptation(blackjax_tpu.nuts, TARGET.logdensity_fn)
    (state, parameters), _ = warmup.run(warmup_key, jnp.zeros(D), 800)
    algo = blackjax_tpu.nuts(TARGET.logdensity_fn, **parameters)
    _, (states, _) = run_inference_algorithm(
        rng_key=sample_key,
        initial_state=state,
        inference_algorithm=algo,
        num_steps=1200,
    )
    pos = states.position  # (steps, D)
    half = pos.shape[0] // 2
    rhat = potential_scale_reduction(jnp.stack([pos[:half], pos[half : 2 * half]]))
    ess = effective_sample_size(pos[None])
    groups = {
        "scalars": slice(0, 4),
        "log_lambda": slice(4, 4 + M),
        "beta_tilde": slice(4 + M, D),
    }
    for name, sl in groups.items():
        assert float(jnp.max(rhat[sl])) < 1.2, (name, rhat[sl])
        assert float(jnp.min(ess[sl])) > 40.0, (name, ess[sl])
