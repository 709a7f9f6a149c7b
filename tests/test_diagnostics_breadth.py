"""Diagnostics breadth: axis-parameter handling, ess_tail prob semantics,
pareto-khat variants, and PSIS edge behavior.

Scenario parity target: the reference's ``tests/test_diagnostics.py``
(negative axes, prob_param variants, khat multidim/tail_frac, funnel tail
ESS).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu import diagnostics

# ---------------------------------------------------------------------------
# axis parameter handling
# ---------------------------------------------------------------------------


def _chains(rng_key, m=4, n=600, extra=()):
    return jax.random.normal(rng_key, (m, n, *extra))


def test_negative_axes_match_positive(rng_key):
    x = _chains(rng_key, extra=(3,))
    for fn in (
        diagnostics.potential_scale_reduction,
        diagnostics.rhat,
        diagnostics.effective_sample_size,
        diagnostics.ess_bulk,
        diagnostics.ess_tail,
    ):
        pos = np.asarray(fn(x, chain_axis=0, sample_axis=1))
        neg = np.asarray(fn(x, chain_axis=-3, sample_axis=-2))
        np.testing.assert_allclose(pos, neg, rtol=1e-12)


def test_swapped_axes_consistent(rng_key):
    x = _chains(rng_key)
    transposed = jnp.swapaxes(x, 0, 1)  # (N, M)
    a = float(diagnostics.effective_sample_size(x))
    b = float(diagnostics.effective_sample_size(transposed, chain_axis=1, sample_axis=0))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_event_shape_broadcast(rng_key):
    x = _chains(rng_key, extra=(2, 3))
    r = diagnostics.rhat(x)
    e = diagnostics.ess_bulk(x)
    assert r.shape == (2, 3)
    assert e.shape == (2, 3)


# ---------------------------------------------------------------------------
# ess_tail prob semantics
# ---------------------------------------------------------------------------


def test_ess_tail_prob_090_matches_5_95_quantiles(rng_key):
    """prob=0.90 is defined as the (0.05, 0.95) tail indicators; an
    explicit indicator-ESS computation must reproduce it."""
    x = _chains(rng_key, m=4, n=400)
    auto = float(diagnostics.ess_tail(x, prob=0.90))

    split = jnp.concatenate([x[:, :200], x[:, 200:]], axis=0)
    lo = jnp.quantile(split, 0.05)
    hi = jnp.quantile(split, 0.95)
    manual = min(
        float(diagnostics.effective_sample_size((split <= lo).astype(x.dtype))),
        float(diagnostics.effective_sample_size((split >= hi).astype(x.dtype))),
    )
    np.testing.assert_allclose(auto, manual, rtol=1e-10)


def test_ess_tail_prob_changes_result(rng_key):
    x = _chains(rng_key)
    a = float(diagnostics.ess_tail(x, prob=0.90))
    b = float(diagnostics.ess_tail(x, prob=0.50))
    assert a != b


def test_sticky_tail_ess_below_bulk(rng_key):
    """A sampler that visits the upper tail in long contiguous excursions
    (funnel-neck behavior) must show tail ESS well under bulk ESS: the bulk
    is iid here, but the top-5% indicator is a long-run binary series."""
    m, n = 4, 2000
    x = jax.random.normal(rng_key, (m, n))
    # carve two 60-step excursions per chain into the far upper tail
    idx = jnp.arange(n)
    in_block = ((idx >= 300) & (idx < 360)) | ((idx >= 1300) & (idx < 1360))
    excursion = 6.0 + 0.1 * jax.random.normal(jax.random.fold_in(rng_key, 1), (m, n))
    x = jnp.where(in_block[None, :], excursion, x)
    tail = float(diagnostics.ess_tail(x))
    bulk = float(diagnostics.ess_bulk(x))
    assert tail < 0.5 * bulk


# ---------------------------------------------------------------------------
# pareto khat
# ---------------------------------------------------------------------------


def test_khat_multidim_input_is_ravelled(rng_key):
    x = jax.random.normal(rng_key, (8, 125))
    a = float(diagnostics.pareto_khat(x))
    b = float(diagnostics.pareto_khat(x.ravel()))
    np.testing.assert_allclose(a, b, rtol=1e-12)


def test_khat_tail_frac_changes_estimate(rng_key):
    x = jax.random.cauchy(rng_key, (4000,))
    a = float(diagnostics.pareto_khat(x, tail_frac=0.05))
    b = float(diagnostics.pareto_khat(x, tail_frac=0.25))
    assert a != b
    # both still flag the Cauchy as heavy-tailed
    assert a > 0.5 and b > 0.5


def test_khat_one_sided_tails(rng_key):
    """An exponential sample has a heavy right tail relative to its hard
    left edge: right khat must exceed left khat, and both stay below the
    both-tails maximum + tolerance."""
    x = jax.random.exponential(rng_key, (4000,))
    left = float(diagnostics.pareto_khat(x, tail="left"))
    right = float(diagnostics.pareto_khat(x, tail="right"))
    both = float(diagnostics.pareto_khat(x, tail="both"))
    assert right > left
    np.testing.assert_allclose(both, max(left, right), rtol=1e-12)


# ---------------------------------------------------------------------------
# PSIS weights
# ---------------------------------------------------------------------------


def test_psis_weights_normalized_and_ordered(rng_key):
    log_ratios = jax.random.normal(rng_key, (2000,))
    logw, khat = diagnostics.psis_weights(log_ratios)
    # returned unnormalized by contract: normalize with logsumexp downstream
    logw = logw - jax.scipy.special.logsumexp(logw)
    w = np.exp(np.asarray(logw))
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-6)
    # smoothing preserves the ordering of the underlying ratios
    order_in = np.argsort(np.asarray(log_ratios))
    order_out = np.argsort(np.asarray(logw))
    np.testing.assert_array_equal(order_in[:100], order_out[:100])
    assert float(khat) < 0.7  # well-behaved lognormal ratios


def test_psis_khat_flags_heavy_ratio_tails(rng_key):
    # ratios drawn from a Pareto with tail index 1 (r = 1/u): the fitted
    # khat must recover ~1 and exceed the 0.7 reliability threshold
    u = jax.random.uniform(rng_key, (4000,), minval=1e-12)
    log_ratios = -jnp.log(u)
    _, khat = diagnostics.psis_weights(log_ratios)
    assert 0.7 < float(khat) < 1.5
