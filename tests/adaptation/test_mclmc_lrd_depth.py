"""Depth tier for the MCLMC Low-Rank-Diagonal warmup's internal laws.

Scenario-class parity target: the reference's
``tests/adaptation/test_mclmc_lrd_adaptation.py`` (kappa_eff spectrum
accounting, SVD extraction contracts, rank-guard clamping, DA-ceiling
warning conditions, scaling-law gate). The pins are closed-form against
OUR definitions in ``blackjax_tpu/adaptation/mclmc_lrd_adaptation.py``:
kappa_eff = max/min over {1} ∪ {1/mu : mu in residual tail}.
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.mclmc_lrd_adaptation import (
    _extract_lrd_from_samples,
    _kappa_eff_pilot,
    _warn_da_ceiling,
    mclmc_lrd_warmup,
)

# ---------------------------------------------------------------------------
# kappa_eff laws
# ---------------------------------------------------------------------------


def test_kappa_full_rank_is_one():
    """k >= number of spectrum entries: no residual tail, kappa_eff = 1."""
    lam = jnp.array([3.0, 0.2, 1.0])
    assert _kappa_eff_pilot(lam, 3) == 1.0
    assert _kappa_eff_pilot(lam, 5) == 1.0
    assert _kappa_eff_pilot(jnp.zeros((0,)), 0) == 1.0


def test_kappa_isotropic_residual_is_one():
    """Residual eigenvalues all 1 -> each contributes 1/1, spread 1."""
    lam = jnp.array([5.0, 1.0, 1.0, 1.0])
    np.testing.assert_allclose(_kappa_eff_pilot(lam, 1), 1.0)


def test_kappa_residual_spread_closed_form():
    """Residual {0.5, 2.0} -> inverses {2, 0.5} -> kappa = 2/0.5 = 4;
    the captured head (however extreme) does not enter."""
    lam = jnp.array([100.0, 0.5, 2.0])
    np.testing.assert_allclose(_kappa_eff_pilot(lam, 1), 4.0, rtol=1e-6)
    # one-sided residual below 1: {1} anchors the other end
    lam = jnp.array([100.0, 0.25])
    np.testing.assert_allclose(_kappa_eff_pilot(lam, 1), 4.0, rtol=1e-6)
    # one-sided residual above 1: 1/mu < 1, anchored by 1 again
    lam = jnp.array([100.0, 4.0])
    np.testing.assert_allclose(_kappa_eff_pilot(lam, 1), 4.0, rtol=1e-6)


def test_kappa_zero_rank_reads_whole_spectrum():
    """k = 0: every direction is residual — kappa over the full tail."""
    lam = jnp.array([2.0, 1.0, 0.5])
    # inverses {0.5, 1, 2} -> 2 / 0.5
    np.testing.assert_allclose(_kappa_eff_pilot(lam, 0), 4.0, rtol=1e-6)


def test_kappa_degenerate_residual_guarded():
    """Numerically-zero residual eigenvalues are replaced by 1, not
    amplified into infinities."""
    lam = jnp.array([10.0, 1e-15])
    out = _kappa_eff_pilot(lam, 1)
    assert np.isfinite(out) and out == 1.0


def test_kappa_is_positive_finite_float(rng_key):
    lam = jnp.sort(jax.random.uniform(rng_key, (8,), minval=0.05, maxval=4.0))
    out = _kappa_eff_pilot(lam, 2)
    assert isinstance(out, float) and np.isfinite(out) and out >= 1.0


# ---------------------------------------------------------------------------
# SVD extraction contracts
# ---------------------------------------------------------------------------


def _correlated_draws(key, n=400, d=6, rho=0.9):
    z = jax.random.normal(key, (n, d))
    mix = jnp.eye(d).at[0, 1].set(rho)
    return z @ mix.T * jnp.arange(1.0, d + 1.0)[None, :]


def test_extraction_U_columns_are_orthonormal(rng_key):
    sigma, U, lam, _ = _extract_lrd_from_samples(_correlated_draws(rng_key), 3)
    gram = np.asarray(U.T @ U)
    np.testing.assert_allclose(gram, np.eye(3), atol=1e-6)


def test_extraction_sigma_positive_and_zero_variance_unit(rng_key):
    draws = _correlated_draws(rng_key)
    draws = draws.at[:, 2].set(7.7)  # constant coordinate
    sigma, U, lam, _ = _extract_lrd_from_samples(draws, 2)
    assert np.all(np.asarray(sigma) > 0)
    np.testing.assert_allclose(float(sigma[2]), 1.0)


def test_extraction_spectrum_sorted_by_informativeness(rng_key):
    """lam_all_sorted is ordered by descending |lam - 1| and the selected
    head equals its first k entries (raw tail handling)."""
    _, _, lam_k, lam_all = _extract_lrd_from_samples(_correlated_draws(rng_key), 3)
    dist = np.abs(np.asarray(lam_all) - 1.0)
    assert np.all(np.diff(dist) <= 1e-12)
    np.testing.assert_allclose(np.asarray(lam_k), np.asarray(lam_all[:3]))


def test_extraction_shapes(rng_key):
    d, k = 5, 2
    sigma, U, lam, lam_all = _extract_lrd_from_samples(
        _correlated_draws(rng_key, d=d), k
    )
    assert sigma.shape == (d,) and U.shape == (d, k) and lam.shape == (k,)
    assert lam_all.shape[0] == min(400, d)


# ---------------------------------------------------------------------------
# DA-ceiling warning conditions
# ---------------------------------------------------------------------------


def test_ceiling_warning_fires_at_and_near_ceiling():
    with pytest.warns(UserWarning, match="DA ceiling"):
        _warn_da_ceiling(1.0 / 1.1, 1.0, 1.15)
    with pytest.warns(UserWarning, match="floor_factor"):
        _warn_da_ceiling(0.9995 / 1.1, 1.0, 1.15)


def test_ceiling_no_warning_when_below():
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _warn_da_ceiling(0.9 / 1.1, 1.0, 1.15)
        _warn_da_ceiling(0.1, 1.0, 1.15)


# ---------------------------------------------------------------------------
# scaling-law gate + output contracts (small end-to-end)
# ---------------------------------------------------------------------------


def _small_warmup(rng_key, **kwargs):
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / jnp.array([1.0, 4.0]))
    defaults = dict(
        k=1,
        pilot_num_warmup=80,
        pilot_num_samples=160,
        lrd_num_steps=80,
        num_chains=2,
    )
    defaults.update(kwargs)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return mclmc_lrd_warmup(logdensity, jnp.ones(2), rng_key, **defaults)


@pytest.mark.slow
def test_e1_gate_fires_on_well_conditioned_target(rng_key):
    """A near-isotropic 2-d Gaussian has kappa_eff <= 5 after the pilot:
    the sqrt(d) scaling-law warm start must engage under the default
    ``warmup_step_init="law"`` and be recorded in the diagnostics."""
    res = _small_warmup(rng_key)
    assert res.diagnostics["kappa_eff_pilot"] <= 5.0
    assert res.diagnostics["e1_fired"] is True


@pytest.mark.slow
def test_default_step_init_never_fires_e1(rng_key):
    res = _small_warmup(rng_key, warmup_step_init="default")
    assert res.diagnostics["e1_fired"] is False


@pytest.mark.slow
def test_outputs_are_scalars_and_imm_shapes(rng_key):
    res = _small_warmup(rng_key)
    assert jnp.shape(res.L) == () and jnp.shape(res.step_size) == ()
    assert float(res.step_size) > 0 and float(res.L) > 0
    assert res.inverse_mass_matrix.sigma.shape == (2,)
    assert res.inverse_mass_matrix.U.shape == (2, 1)
    assert res.inverse_mass_matrix.lam.shape == (1,)
    # k guard bookkeeping is coherent
    diag = res.diagnostics
    assert diag["k_used"] >= 1 and diag["k_used"] <= max(diag["k_safe"], 1)
