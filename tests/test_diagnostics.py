"""Convergence-diagnostics tests.

Parity model: reference ``tests/test_diagnostics.py`` — shape contracts,
converged/non-converged discrimination for R-hat, iid-chain calibration for
the ESS family, and tail behavior for Pareto k-hat.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.diagnostics import (
    effective_sample_size,
    ess_bulk,
    ess_tail,
    pareto_khat,
    potential_scale_reduction,
    rhat,
)


def _iid_chains(key, num_chains=4, num_samples=1000, event=()):
    return jax.random.normal(key, (num_chains, num_samples) + event)


class TestPotentialScaleReduction:
    def test_scalar_output_shape(self, rng_key):
        x = _iid_chains(rng_key)
        assert jnp.ndim(potential_scale_reduction(x)) == 0

    def test_vector_output_shape(self, rng_key):
        x = _iid_chains(rng_key, event=(3,))
        assert potential_scale_reduction(x).shape == (3,)

    def test_converged_chains_near_one(self, rng_key):
        x = _iid_chains(rng_key)
        assert abs(float(potential_scale_reduction(x)) - 1.0) < 0.02

    def test_nonconverged_chains_above_one(self, rng_key):
        x = _iid_chains(rng_key)
        # displace one chain's mean: between-chain variance blows up
        x = x.at[0].add(3.0)
        assert float(potential_scale_reduction(x)) > 1.2

    def test_scale_nonconvergence_detected(self, rng_key):
        x = _iid_chains(rng_key)
        x = x.at[0].multiply(6.0)
        # variance mismatch is a rank-normalized-rhat signature
        assert float(rhat(x)) > 1.05

    def test_axis_invariance(self, rng_key):
        x = _iid_chains(rng_key)
        a = potential_scale_reduction(x, chain_axis=0, sample_axis=1)
        b = potential_scale_reduction(x.T, chain_axis=1, sample_axis=0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


class TestEffectiveSampleSize:
    def test_shapes(self, rng_key):
        assert jnp.ndim(effective_sample_size(_iid_chains(rng_key))) == 0
        assert effective_sample_size(_iid_chains(rng_key, event=(3,))).shape == (3,)

    def test_iid_normal_close_to_total_samples(self, rng_key):
        x = _iid_chains(rng_key, num_chains=4, num_samples=2500)
        ess = float(effective_sample_size(x))
        assert 0.5 * 10_000 < ess < 1.5 * 10_000

    def test_autocorrelated_chain_gives_lower_ess(self, rng_key):
        n, rho = 2000, 0.9
        eps = jax.random.normal(rng_key, (4, n))

        def ar1(carry, e):
            x = rho * carry + jnp.sqrt(1 - rho**2) * e
            return x, x

        _, x = jax.lax.scan(ar1, jnp.zeros(4), eps.T)
        x = x.T  # (chains, samples)
        ess_ar = float(effective_sample_size(x))
        ess_iid = float(effective_sample_size(eps))
        # AR(0.9): asymptotic ESS factor (1-rho)/(1+rho) ~ 0.053
        assert ess_ar < 0.15 * ess_iid

    def test_bulk_tail_variants(self, rng_key):
        x = _iid_chains(rng_key, num_samples=2000)
        bulk = float(ess_bulk(x))
        tail = float(ess_tail(x))
        assert bulk > 2000 and tail > 2000  # healthy iid chains

    def test_ar1_quantitative(self, rng_key):
        """For AR(1) with coefficient rho the asymptotic ESS fraction is
        (1-rho)/(1+rho); the Geyer estimator must land near it."""
        rho, n, chains = 0.5, 40_000, 4
        eps = jax.random.normal(rng_key, (n, chains))

        def ar1(carry, e):
            x = rho * carry + jnp.sqrt(1.0 - rho**2) * e
            return x, x

        _, x = jax.lax.scan(ar1, jnp.zeros(chains), eps)
        ess = float(effective_sample_size(x.T))
        expected = chains * n * (1.0 - rho) / (1.0 + rho)
        assert 0.85 * expected < ess < 1.15 * expected, (ess, expected)

    def test_antithetic_chain_exceeds_sample_size(self, rng_key):
        """Negative lag-1 autocorrelation gives super-efficient ESS > N —
        the estimator must not clip it away (Geyer initial-sequence
        behavior)."""
        rho, n, chains = -0.6, 20_000, 4
        eps = jax.random.normal(rng_key, (n, chains))

        def ar1(carry, e):
            x = rho * carry + jnp.sqrt(1.0 - rho**2) * e
            return x, x

        _, x = jax.lax.scan(ar1, jnp.zeros(chains), eps)
        ess = float(effective_sample_size(x.T))
        assert ess > 1.5 * chains * n

    def test_axis_invariance(self, rng_key):
        x = _iid_chains(rng_key)
        a = effective_sample_size(x, chain_axis=0, sample_axis=1)
        b = effective_sample_size(x.T, chain_axis=1, sample_axis=0)
        np.testing.assert_allclose(float(a), float(b), rtol=1e-6)

    def test_heavy_tails_rank_normalized(self, rng_key):
        """ess_bulk rank-normalizes, so iid Cauchy chains (infinite variance)
        must still report a healthy bulk-ESS near the sample count."""
        x = jax.random.cauchy(rng_key, (4, 2000))
        bulk = float(ess_bulk(x))
        assert 0.5 * 8000 < bulk < 1.5 * 8000


class TestParetoKhat:
    def test_scalar_output(self, rng_key):
        x = jax.random.normal(rng_key, (4, 1000))
        assert jnp.ndim(pareto_khat(x)) == 0

    def test_normal_tail_below_half(self, rng_key):
        x = jax.random.normal(rng_key, (8000,))
        assert float(pareto_khat(x)) < 0.5

    def test_cauchy_heavier_than_normal(self, rng_key):
        k1, k2 = jax.random.split(rng_key)
        normal = jax.random.normal(k1, (8000,))
        cauchy = jax.random.cauchy(k2, (8000,))
        assert float(pareto_khat(cauchy)) > float(pareto_khat(normal))
        assert float(pareto_khat(cauchy)) > 0.7  # k ~ 1 for Cauchy

    def test_both_is_max_of_upper_lower(self, rng_key):
        x = jax.random.cauchy(rng_key, (4000,))
        both = float(pareto_khat(x, tail="both"))
        upper = float(pareto_khat(x, tail="right"))
        lower = float(pareto_khat(x, tail="left"))
        assert both == pytest.approx(max(upper, lower), rel=1e-6)


class TestGPDFit:
    def test_recovers_known_shapes(self):
        """Zhang-Stephens fit on synthetic GPD data with known k."""
        from blackjax_tpu.diagnostics import _gpdfit

        rng = np.random.default_rng(0)
        u = rng.uniform(size=800)
        for k_true in (0.5, 1.0, -0.2, 0.0):
            x = (u ** (-k_true) - 1.0) / k_true if abs(k_true) > 1e-9 else -np.log(u)
            k, sigma = _gpdfit(jnp.asarray(np.sort(x)))
            assert abs(float(k) - k_true) < 0.1, (k_true, float(k))
            assert 0.7 < float(sigma) < 1.3

    def test_psis_weights_smooth_and_flag(self, rng_key):
        from blackjax_tpu.diagnostics import psis_weights

        # well-behaved ratios: k small, weights barely change
        lw = 0.1 * jax.random.normal(rng_key, (4000,))
        smoothed, k = psis_weights(lw)
        assert float(k) < 0.5
        assert float(jnp.max(smoothed)) <= float(jnp.max(lw)) + 1e-6
        # heavy-tailed ratios: exponential log-weights with rate 1/0.9 give
        # a Pareto weight tail with k = 0.9 — must flag trouble
        lw_bad = 0.9 * jax.random.exponential(rng_key, (4000,))
        _, k_bad = psis_weights(lw_bad)
        # finite-sample + prior shrinkage put the estimate below 0.9; it
        # must still clearly separate from the well-behaved case
        assert float(k_bad) > 0.55
        assert float(k_bad) > float(k) + 0.3
