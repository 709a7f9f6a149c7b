"""Closed-form unit pins for the multi-chain detection internals.

Scenario-class parity target: the reference's
``tests/adaptation/test_meta_detection.py`` unit classes. Each pin builds
a deterministic configuration whose verdict is forced by construction:
the LOO conjunction must reject single-outlier spikes, the gap statistic
must separate equal spacing from clusters, the contraction t must go
strongly negative under uniform drift toward the grand mean, the lag-1
screen must sign-separate diffusive ramps from integrator alternation,
and the pooled within-spectrum must be exactly mode-blind (per-chain
centering).
"""
import jax.numpy as jnp
import numpy as np

from blackjax_tpu.adaptation.meta._detection import (
    _compute_contraction_stat,
    _compute_lag1_autocorr_top_dir,
    _compute_pooled_within_spectrum,
    _loo_detection_passes,
    _unimodality_gap_stat,
)


# ---------------------------------------------------------------------------
# leave-one-out robustness
# ---------------------------------------------------------------------------


def _loo(chain_means, n=100.0, edge=10.0):
    cm = jnp.asarray(chain_means, jnp.float32)
    M, d = cm.shape
    return bool(
        _loo_detection_passes(
            cm, jnp.ones(d, jnp.float32), jnp.float32(n), M, d, edge
        )
    )


def test_loo_passes_when_every_chain_carries_the_spike():
    """Alternating +/-s offsets along e1 survive any single drop: the top
    eigenvalue of the centered Gram stays ~s^2 * (M-1) for every subset."""
    s = 3.0
    cm = np.zeros((4, 3), np.float32)
    cm[:, 0] = [s, -s, s, -s]
    assert _loo(cm)


def test_loo_rejects_single_outlier_spike():
    """One outlier chain at 10*e1, the rest at 0: dropping the outlier
    leaves a zero spectrum, so the conjunction must fail even though the
    full-ensemble eigenvalue is enormous."""
    cm = np.zeros((4, 3), np.float32)
    cm[0, 0] = 10.0
    assert not _loo(cm)


def test_loo_rejects_null_scatter():
    cm = 1e-3 * np.eye(4, 3, dtype=np.float32)
    assert not _loo(cm)


# ---------------------------------------------------------------------------
# unimodality gap statistic
# ---------------------------------------------------------------------------


def test_gap_stat_equal_spacing_is_unimodal():
    """Equally spaced projections have max_gap == mean_gap (ratio 1),
    below any admissible threshold."""
    cm = jnp.stack([jnp.array([float(i), 0.0]) for i in range(6)])
    ok, ratio = _unimodality_gap_stat(cm, jnp.array([1.0, 0.0]), 6)
    np.testing.assert_allclose(float(ratio), 1.0, rtol=1e-6)
    assert bool(ok)


def test_gap_stat_two_clusters_flags_mode_split():
    """Two tight clusters far apart: one gap dominates the mean gap."""
    proj = [0.0, 0.01, 0.02, 8.0, 8.01, 8.02]
    cm = jnp.stack([jnp.array([p, 0.0]) for p in proj])
    ok, ratio = _unimodality_gap_stat(cm, jnp.array([1.0, 0.0]), 6)
    assert float(ratio) > 4.0
    assert not bool(ok)


# ---------------------------------------------------------------------------
# contraction statistic
# ---------------------------------------------------------------------------


def _drift_buffer(scale_early, scale_late, M=4, B=64, d=3, noise=0.05):
    """Chains at offsets +/-e1, +/-e2; early rows at scale_early * offset,
    late rows at scale_late * offset, plus seeded iid noise so the
    within-chain variance (the t's denominator) is honest."""
    offsets = np.zeros((M, d), np.float32)
    offsets[0, 0], offsets[1, 0] = 1.0, -1.0
    offsets[2, 1], offsets[3, 1] = 1.0, -1.0
    t = np.arange(B)
    scal = np.where(t < B // 2, scale_early, scale_late).astype(np.float32)
    buf = offsets[:, None, :] * scal[None, :, None]
    rng = np.random.default_rng(11)
    buf = buf + noise * rng.standard_normal((M, B, d)).astype(np.float32)
    chain_means = buf.mean(1)
    grand = chain_means.mean(0)
    return jnp.asarray(buf), jnp.asarray(chain_means), jnp.asarray(grand)


def test_contraction_strongly_negative_under_uniform_drift():
    buf, cm, grand = _drift_buffer(2.0, 1.0)
    t = _compute_contraction_stat(buf, cm, grand, jnp.int32(64), 4)
    assert float(t) < -5.0


def test_contraction_near_zero_for_static_chains():
    buf, cm, grand = _drift_buffer(1.5, 1.5)
    t = _compute_contraction_stat(buf, cm, grand, jnp.int32(64), 4)
    assert abs(float(t)) < 2.0


def test_contraction_positive_under_expansion():
    buf, cm, grand = _drift_buffer(1.0, 2.0)
    t = _compute_contraction_stat(buf, cm, grand, jnp.int32(64), 4)
    assert float(t) > 5.0


# ---------------------------------------------------------------------------
# lag-1 autocorrelation screen
# ---------------------------------------------------------------------------


def _proj_buffer(series, M=3, d=4):
    """Every chain carries ``series`` on coordinate 0."""
    B = len(series)
    buf = np.zeros((M, B, d), np.float32)
    buf[:, :, 0] = np.asarray(series, np.float32)[None, :]
    cm = buf.mean(1)
    return jnp.asarray(buf), jnp.asarray(cm)


def test_lag1_alternating_series_is_negative():
    """x_t = (-1)^t is the pure integrator-resonance signature: lag-1
    autocorrelation -1 (up to the n/(n-2) normalization)."""
    buf, cm = _proj_buffer([(-1.0) ** t for t in range(32)])
    e1 = jnp.zeros(4).at[0].set(1.0)
    r = _compute_lag1_autocorr_top_dir(
        buf, cm, jnp.ones(4, jnp.float32), e1, jnp.int32(32), 3
    )
    assert float(r) < -0.8


def test_lag1_linear_ramp_is_positive():
    buf, cm = _proj_buffer(np.linspace(-1.0, 1.0, 32))
    e1 = jnp.zeros(4).at[0].set(1.0)
    r = _compute_lag1_autocorr_top_dir(
        buf, cm, jnp.ones(4, jnp.float32), e1, jnp.int32(32), 3
    )
    assert float(r) > 0.8


# ---------------------------------------------------------------------------
# pooled within-chain spectrum
# ---------------------------------------------------------------------------


def _planted_within(rho=0.95, M=4, B=200, d=5, seed=7):
    rng = np.random.default_rng(seed)
    z = rng.standard_normal((M, B, d)).astype(np.float32)
    # plant a within-chain correlation between coords 0 and 1
    z[..., 1] = rho * z[..., 0] + np.sqrt(1 - rho**2) * z[..., 1]
    return z


def test_pooled_spectrum_recovers_planted_direction():
    z = _planted_within()
    cm = z.mean(1)
    lam, vec = _compute_pooled_within_spectrum(
        jnp.asarray(z), jnp.asarray(cm), jnp.asarray(z.var(axis=(0, 1))),
        jnp.int32(z.shape[1]), z.shape[0], 3
    )
    v = np.asarray(vec)
    # the planted direction is (e0 + e1)/sqrt(2) in whitened coordinates
    target = np.zeros(5); target[:2] = 1 / np.sqrt(2)
    assert abs(float(np.dot(v, target))) > 0.95
    assert float(lam) > 1.5  # well above the isotropic bulk (~1)


def test_pooled_spectrum_is_mode_blind():
    """Adding enormous per-chain mean offsets (a mode split) must leave
    the within spectrum EXACTLY unchanged — per-chain centering."""
    z = _planted_within()
    offsets = np.zeros((4, 5), np.float32)
    offsets[:, 3] = [100.0, -100.0, 50.0, -50.0]
    z_split = z + offsets[:, None, :]
    args = dict(n=jnp.int32(z.shape[1]), M=4, max_rank=3)
    W = jnp.asarray(z.var(axis=(0, 1)))
    lam_a, vec_a = _compute_pooled_within_spectrum(
        jnp.asarray(z), jnp.asarray(z.mean(1)), W, **args
    )
    lam_b, vec_b = _compute_pooled_within_spectrum(
        jnp.asarray(z_split), jnp.asarray(z_split.mean(1)), W, **args
    )
    np.testing.assert_allclose(float(lam_a), float(lam_b), rtol=1e-5)
    np.testing.assert_allclose(
        np.abs(np.asarray(vec_a)), np.abs(np.asarray(vec_b)), atol=1e-4
    )
