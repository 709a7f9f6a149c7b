"""Analytic-pin depth tier for the diagnostics stack.

The breadth tier (``test_diagnostics_breadth.py``) checks shapes and
qualitative orderings; this tier pins the *numbers* against closed forms,
mirroring the reference's statistical depth
(``/root/reference/tests/test_diagnostics.py``):

- AR(1) chains have a known integrated autocorrelation time,
  ``tau = (1 + rho) / (1 - rho)``, so ESS/N has an analytic target.
- Rank-normalized split-R-hat is exactly invariant under strictly
  monotone transformations of the draws.
- The GPD machinery (`_gpdfit`/`_gpinv`) round-trips: samples drawn from
  a generalized Pareto via the quantile function recover (k, sigma).
- PSIS on Student-t-vs-normal importance ratios reproduces the known
  k-hat = 1/nu tail index regime, and smoothing only shrinks the tail.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu import diagnostics as diag

# exactness pins run in BOTH precision passes: bit-level determinism under
# x64, a few ULP of f32 arithmetic under BJT_TEST_X64=0
_X64 = jnp.zeros(()).dtype == jnp.dtype("float64")
EXACT_RTOL = 1e-12 if _X64 else 5e-6


def _ar1(key, rho, m, n):
    dtype = jnp.zeros(()).dtype  # f64 under the x64 pass, f32 under BJT_TEST_X64=0
    """M independent AR(1) chains, stationary unit marginal variance."""
    innov_scale = np.sqrt(1.0 - rho**2)
    k0, k1 = jax.random.split(key)
    x0 = jax.random.normal(k0, (m,), dtype)
    eps = innov_scale * jax.random.normal(k1, (m, n), dtype)

    def step(x, e):
        x = rho * x + e
        return x, x

    _, xs = jax.lax.scan(step, x0, jnp.moveaxis(eps, 1, 0))
    return jnp.moveaxis(xs, 0, 1)  # (M, N)


class TestESSAnalytic:
    @pytest.mark.parametrize("rho", [0.0, 0.3, 0.6, 0.9])
    def test_ar1_ess_matches_iact(self, rng_key, rho):
        # tau = (1+rho)/(1-rho); ESS -> M*N/tau.  Estimator noise at
        # N=4096, M=4 is a few percent; 20% relative tolerance is ~6
        # sigma wide (verified by a 50-seed offline sweep).
        m, n = 4, 4096
        x = _ar1(rng_key, rho, m, n)
        ess = float(diag.effective_sample_size(x))
        tau = (1.0 + rho) / (1.0 - rho)
        expected = m * n / tau
        assert ess == pytest.approx(expected, rel=0.20)

    def test_antithetic_chain_ess_exceeds_n(self, rng_key):
        # rho < 0 gives tau < 1: super-efficient. Geyer's *initial
        # positive pair sum* construction keeps the negative lag-1 term
        # inside the first pair, so ESS > M*N must survive truncation.
        x = _ar1(rng_key, -0.5, 4, 4096)
        ess = float(diag.effective_sample_size(x))
        assert ess > 4 * 4096

    def test_ess_cap_scales_with_log_sample_size(self, rng_key):
        # the estimator caps at M*N*log10(M*N) — a perfectly antithetic
        # sequence cannot report unbounded ESS
        n = 512
        t = jnp.arange(n, dtype=jnp.zeros(()).dtype)
        x = jnp.stack([(-1.0) ** t, (-1.0) ** (t + 1)])
        x = x + 1e-3 * jax.random.normal(rng_key, x.shape)
        ess = float(diag.effective_sample_size(x))
        assert ess <= 2 * n * np.log10(2 * n) + 1e-6

    def test_affine_invariance(self, rng_key):
        x = _ar1(rng_key, 0.5, 4, 1024)
        a = diag.effective_sample_size(x)
        b = diag.effective_sample_size(3.7 * x - 11.0)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=EXACT_RTOL)

    def test_single_chain_matches_multichain_split(self, rng_key):
        # one long chain vs the same draws split in two: between-chain
        # variance of a stationary stream is small, so the two estimates
        # agree loosely (sanity on the m==1 var_plus branch)
        x = _ar1(rng_key, 0.4, 1, 8192)
        whole = float(diag.effective_sample_size(x))
        halves = x.reshape(2, 4096)
        split = float(diag.effective_sample_size(halves))
        assert whole == pytest.approx(split, rel=0.25)


class TestRhatInvariance:
    @staticmethod
    def _bulk_rhat(x):
        # the bulk (unfolded) rank-normalized split-R-hat — the component
        # with the exact monotone-invariance guarantee; the folded term
        # re-sorts around the transformed median, so the public max is
        # only approximately invariant
        return diag.potential_scale_reduction(
            diag._rank_normalize(diag._split_chains(x))
        )

    def test_bulk_monotone_invariance_exact(self, rng_key):
        x = jax.random.normal(rng_key, (4, 500))
        base = self._bulk_rhat(x)
        for f in (lambda v: jnp.exp(v), lambda v: v**3, lambda v: jnp.arctan(v)):
            np.testing.assert_allclose(
                np.asarray(self._bulk_rhat(f(x))), np.asarray(base), rtol=EXACT_RTOL
            )

    def test_full_rhat_monotone_near_invariant(self, rng_key):
        # the folded component moves by O(rank perturbation at the median);
        # on stationary chains the public statistic stays within 1%
        x = jax.random.normal(rng_key, (4, 500))
        base = float(diag.rhat(x))
        for f in (lambda v: jnp.exp(v), lambda v: v**3):
            assert float(diag.rhat(f(x))) == pytest.approx(base, rel=1e-2)

    def test_bulk_decreasing_map_also_invariant(self, rng_key):
        # a strictly decreasing map reverses ranks; Blom scores are
        # antisymmetric under rank reversal, so split-R-hat of the
        # rank-normalized draws is unchanged
        x = jax.random.normal(rng_key, (4, 500))
        base = self._bulk_rhat(x)
        np.testing.assert_allclose(
            np.asarray(self._bulk_rhat(-jnp.exp(x))), np.asarray(base), rtol=EXACT_RTOL
        )

    def test_location_shift_detected_at_known_magnitude(self, rng_key):
        # two chains at means 0 and delta, unit variance: classic R-hat is
        # sqrt(1 + delta^2 * n/(2(n-1)) / W) up to noise; at delta = 2 the
        # rank-normalized statistic must clear 1.2 and at delta = 0 stay
        # below 1.05 (rank-normalization compresses but preserves order)
        k0, k1 = jax.random.split(rng_key)
        n = 1000
        a = jax.random.normal(k0, (n,))
        b = jax.random.normal(k1, (n,))
        mixed = jnp.stack([a, b])
        assert float(diag.rhat(mixed)) < 1.05
        assert float(diag.rhat(jnp.stack([a, b + 2.0]))) > 1.2

    def test_variance_mismatch_detected_by_rank_normalization(self, rng_key):
        # chains with equal means but 5x different scales: classic R-hat
        # is blind to this; the folded/rank-normalized form is not
        k0, k1 = jax.random.split(rng_key)
        n = 1000
        a = jax.random.normal(k0, (n,))
        b = 5.0 * jax.random.normal(k1, (n,))
        assert float(diag.rhat(jnp.stack([a, b]))) > 1.1


class TestGPDRoundTrip:
    @pytest.mark.parametrize("k_true", [-0.2, 0.0, 0.3, 0.7])
    def test_fit_recovers_shape(self, rng_key, k_true):
        # draw GPD(k, sigma=1) via the quantile function on uniform grid
        # jitter, fit, recover k within the estimator's prior-shrinkage
        # bias (Zhang-Stephens posterior mean shrinks toward 0.5/n scale)
        n = 4000
        u = (jnp.arange(n, dtype=jnp.zeros(()).dtype) + 0.5) / n
        u = jnp.clip(
            u + 1e-4 * jax.random.normal(rng_key, (n,)),
            1e-9,
            1.0 - 1e-9,
        )
        x = diag._gpinv(u, jnp.asarray(k_true), jnp.asarray(1.0))
        k_hat, sigma_hat = diag._gpdfit(jnp.sort(x))
        assert float(k_hat) == pytest.approx(k_true, abs=0.07)
        assert float(sigma_hat) == pytest.approx(1.0, rel=0.15)

    def test_gpinv_k_zero_is_exponential(self):
        p = jnp.asarray([0.1, 0.5, 0.9])
        x = diag._gpinv(p, jnp.asarray(0.0), jnp.asarray(2.0))
        np.testing.assert_allclose(
            np.asarray(x), -2.0 * np.log1p(-np.asarray(p)), rtol=EXACT_RTOL
        )

    def test_gpinv_is_monotone_in_p(self):
        p = jnp.linspace(0.01, 0.99, 50)
        for k in (-0.3, 0.0, 0.4):
            x = np.asarray(diag._gpinv(p, jnp.asarray(k), jnp.asarray(1.0)))
            assert np.all(np.diff(x) > 0)


class TestParetoKhatRegimes:
    def test_gaussian_tail_is_light(self, rng_key):
        x = jax.random.normal(rng_key, (20_000,))
        assert float(diag.pareto_khat(x)) < 0.3

    @pytest.mark.parametrize("nu", [2.0, 4.0])
    def test_student_t_khat_near_one_over_nu(self, rng_key, nu):
        x = jax.random.t(rng_key, nu, (40_000,))
        k = float(diag.pareto_khat(x, tail="both"))
        assert k == pytest.approx(1.0 / nu, abs=0.12)

    def test_right_left_split(self, rng_key):
        # one-sided heavy tail: |t_2| has the heavy mass on the right only
        x = jnp.abs(jax.random.t(rng_key, 2.0, (40_000,)))
        right = float(diag.pareto_khat(x, tail="right"))
        left = float(diag.pareto_khat(x, tail="left"))
        assert right > left + 0.2


class TestPSISContract:
    def test_smoothing_never_raises_the_max(self, rng_key):
        lw = jax.random.t(rng_key, 3.0, (2000,))
        out, _ = diag.psis_weights(lw)
        assert float(jnp.max(out)) <= float(jnp.max(lw)) + 1e-12

    def test_bulk_weights_untouched(self, rng_key):
        lw = jax.random.normal(rng_key, (2000,))
        out, _ = diag.psis_weights(lw)
        n = lw.shape[0]
        m = int(min(0.2 * n, 3.0 * n**0.5))
        order = jnp.argsort(lw)
        bulk_idx = np.asarray(order[: n - m])
        np.testing.assert_array_equal(
            np.asarray(out)[bulk_idx], np.asarray(lw)[bulk_idx]
        )

    def test_khat_flags_undersampled_proposal(self, rng_key):
        # importance ratios for target t_2 under proposal N(0,1) have an
        # infinite-variance tail: k-hat must land in the "bad" regime
        k0 = rng_key
        x = jax.random.normal(k0, (4000,))
        log_target = jax.scipy.stats.t.logpdf(x, 2.0)
        log_prop = jax.scipy.stats.norm.logpdf(x)
        _, khat = diag.psis_weights(log_target - log_prop)
        assert float(khat) > 0.7

    def test_good_proposal_khat_small(self, rng_key):
        # proposal == target: ratios are constant, the GPD tail is
        # degenerate and k-hat must not flag it
        x = jax.random.normal(rng_key, (4000,))
        lw = 0.01 * jax.random.normal(jax.random.fold_in(rng_key, 1), x.shape)
        _, khat = diag.psis_weights(lw)
        assert float(khat) < 0.5

    def test_tiny_sample_returns_raw(self, rng_key):
        lw = jax.random.normal(rng_key, (10,))
        out, khat = diag.psis_weights(lw)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(lw))
        assert not np.isfinite(float(khat)) or float(khat) > 1e6

    def test_shape_preserved(self, rng_key):
        lw = jax.random.normal(rng_key, (40, 50))
        out, _ = diag.psis_weights(lw)
        assert out.shape == (40, 50)
