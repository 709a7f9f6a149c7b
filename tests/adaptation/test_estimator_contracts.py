"""Metric-estimator contracts: the AIRM SPD mean, eigenpair selection
policies, and the three low-rank payload estimators.

Scenario parity target: the reference's
``tests/adaptation/test_low_rank_adaptation.py`` (SPDMeanTest,
ComputeLowRankMetric contracts) and ``test_metric_estimators.py``
(selection policies, degenerate supports).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.metric_estimators import (
    _spd_mean,
    draws_singular_value_low_rank,
    eigenvalue_informativeness,
    fisher_score_low_rank,
    sample_covariance_eigh_low_rank,
    select_top_eigenvalues_by_informativeness,
)


# eigh-chain identities: full precision under x64, f32 rounding otherwise
RTOL_EIGH = 1e-8 if jax.config.jax_enable_x64 else 5e-4


def _random_spd(key, d, scale=1.0):
    A = jax.random.normal(key, (d, d))
    return scale * (A @ A.T) + jnp.eye(d)


# ---------------------------------------------------------------------------
# AIRM geometric mean
# ---------------------------------------------------------------------------


def test_spd_mean_symmetry(rng_key):
    k1, k2 = jax.random.split(rng_key)
    A, B = _random_spd(k1, 5), _random_spd(k2, 5, scale=3.0)
    np.testing.assert_allclose(
        np.asarray(_spd_mean(A, B)), np.asarray(_spd_mean(B, A)), rtol=RTOL_EIGH
    )


def test_spd_mean_identity_and_equal_cases(rng_key):
    A = _random_spd(rng_key, 4)
    np.testing.assert_allclose(np.asarray(_spd_mean(A, A)), np.asarray(A), rtol=RTOL_EIGH)
    eye = jnp.eye(4)
    np.testing.assert_allclose(np.asarray(_spd_mean(eye, eye)), np.eye(4), rtol=RTOL_EIGH)


def test_spd_mean_commuting_case_is_elementwise_geometric():
    """For commuting (diagonal) inputs the AIRM mean is the elementwise
    geometric mean of the spectra."""
    A = jnp.diag(jnp.array([1.0, 4.0, 9.0]))
    B = jnp.diag(jnp.array([4.0, 1.0, 25.0]))
    expected = np.diag(np.sqrt([4.0, 4.0, 225.0]))
    np.testing.assert_allclose(np.asarray(_spd_mean(A, B)), expected, rtol=RTOL_EIGH)


def test_spd_mean_output_is_spd(rng_key):
    k1, k2 = jax.random.split(rng_key)
    A, B = _random_spd(k1, 6), _random_spd(k2, 6, scale=0.1)
    M = np.asarray(_spd_mean(A, B))
    np.testing.assert_allclose(M, M.T, rtol=RTOL_EIGH, atol=1e-5)
    assert (np.linalg.eigvalsh(M) > 0).all()


# ---------------------------------------------------------------------------
# eigenpair selection policies
# ---------------------------------------------------------------------------


def test_informativeness_is_distance_from_isotropy():
    lam = jnp.array([0.25, 0.9, 1.0, 3.0])
    np.testing.assert_allclose(
        np.asarray(eigenvalue_informativeness(lam)), [0.75, 0.1, 0.0, 2.0],
        rtol=1e-6, atol=1e-7,
    )


def test_mask_pad_masks_uninformative_and_pads(rng_key):
    # q = 3 eigenpairs, max_rank = 5: two informative survive, the bulk
    # eigenvalue is masked to 1, and the output is padded to rank 5
    lam = jnp.array([6.0, 1.3, 0.2])
    V = jnp.eye(4)[:, :3]
    U, lam_out = select_top_eigenvalues_by_informativeness(
        lam, V, 5, tail_handling="mask_pad"
    )
    assert U.shape == (4, 5)
    assert lam_out.shape == (5,)
    got = np.sort(np.asarray(lam_out))
    np.testing.assert_allclose(got, [0.2, 1.0, 1.0, 1.0, 6.0])
    # padded columns are exactly zero
    assert (np.asarray(U[:, 3:]) == 0).all()


def test_raw_selection_keeps_values_unmasked():
    lam = jnp.array([6.0, 1.3, 0.2, 1.0])
    V = jnp.eye(4)
    U, lam_out = select_top_eigenvalues_by_informativeness(
        lam, V, 2, tail_handling="raw"
    )
    np.testing.assert_allclose(np.sort(np.asarray(lam_out)), [0.2, 6.0])


def test_invalid_tail_handling_raises():
    with pytest.raises(ValueError, match="tail_handling"):
        select_top_eigenvalues_by_informativeness(
            jnp.ones(3), jnp.eye(3), 2, tail_handling="clip"
        )


# ---------------------------------------------------------------------------
# low-rank payload estimators
# ---------------------------------------------------------------------------


def _spiked_draws(key, n, d, spike=25.0):
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + spike * jnp.outer(v, v)
    chol = jnp.linalg.cholesky(cov)
    prec = jnp.linalg.inv(cov)
    draws = jax.random.normal(key, (n, d)) @ chol.T
    return draws, -draws @ prec.T, v


def test_fisher_low_rank_contracts(rng_key):
    d, k = 6, 3
    draws, grads, v = _spiked_draws(rng_key, 256, d)
    imm = fisher_score_low_rank(draws, grads, k)
    assert imm.sigma.shape == (d,)
    assert (np.asarray(imm.sigma) > 0).all()
    assert imm.U.shape == (d, k)
    # real columns orthonormal; padded columns zero
    U = np.asarray(imm.U)
    col_norms = np.linalg.norm(U, axis=0)
    for i, nrm in enumerate(col_norms):
        assert nrm == pytest.approx(1.0, rel=1e-6) or nrm == pytest.approx(0.0, abs=1e-12)
    # the planted direction dominates
    assert abs(float(imm.U[:, 0] @ v)) > 0.9


def test_fisher_low_rank_isotropic_masks_to_identity(rng_key):
    d, k = 6, 3
    draws = jax.random.normal(rng_key, (256, d))
    imm = fisher_score_low_rank(draws, -draws, k)
    # nothing informative: every retained eigenvalue is masked to 1
    np.testing.assert_allclose(np.asarray(imm.lam), np.ones(k), rtol=1e-6)


def test_fisher_low_rank_d_less_than_2k(rng_key):
    """max_rank larger than the spectrum width must not crash: the output
    is padded, not truncated mid-formula."""
    d, k = 3, 4
    draws, grads, _ = _spiked_draws(rng_key, 64, d, spike=10.0)
    imm = fisher_score_low_rank(draws, grads, k)
    assert imm.U.shape == (d, k)
    assert np.isfinite(np.asarray(imm.lam)).all()


def test_draws_svd_zero_variance_coordinate_unit_sigma(rng_key):
    d = 4
    draws = jax.random.normal(rng_key, (64, d))
    # frozen coordinate at an exactly-representable value, so the sample
    # variance is exactly zero and the unit-sigma guard fires (the guard is
    # an exact-zero check, reference parity)
    draws = draws.at[:, 2].set(0.5)
    imm = draws_singular_value_low_rank(draws, 2)
    assert float(imm.sigma[2]) == 1.0
    assert np.isfinite(np.asarray(imm.U)).all()


def test_sample_cov_eigh_recovers_spike_and_scales(rng_key):
    d = 5
    scales = jnp.array([0.5, 1.0, 2.0, 1.5, 3.0])
    v = jnp.ones(d) / jnp.sqrt(d)
    corr = jnp.eye(d) + 0.8 * (jnp.outer(v, v) - jnp.eye(d) / d)
    cov = scales[:, None] * corr * scales[None, :]
    n = 4000
    draws = jax.random.normal(rng_key, (n, d)) @ jnp.linalg.cholesky(cov).T
    centered = draws - draws.mean(0)
    m2 = centered.T @ centered
    imm = sample_covariance_eigh_low_rank(m2, n, 2)
    np.testing.assert_allclose(np.asarray(imm.sigma), np.asarray(scales), rtol=0.15)
    assert abs(float(imm.U[:, 0] @ v)) > 0.9


# ---------------------------------------------------------------------------
# low-rank window adaptation breadth
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("rank", [1, 3])
def test_window_adaptation_low_rank_rank_sweep(rng_key, rank):
    d = 6
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 16.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x
    warmup = blackjax_tpu.window_adaptation_low_rank(
        blackjax_tpu.nuts, logdensity, max_rank=rank
    )
    (state, params), _ = warmup.run(rng_key, jnp.zeros(d), num_steps=400)
    imm = params["inverse_mass_matrix"]
    assert imm.U.shape == (d, rank)
    assert np.isfinite(float(params["step_size"]))
    algo = blackjax_tpu.nuts(logdensity, **params)
    new_state, info = algo.step(rng_key, state)
    assert np.isfinite(float(info.acceptance_rate))


def test_window_adaptation_low_rank_with_hmc(rng_key):
    d = 4
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / jnp.array([1.0, 4.0, 0.25, 2.0]))
    warmup = blackjax_tpu.window_adaptation_low_rank(
        blackjax_tpu.hmc, logdensity, max_rank=2, num_integration_steps=10
    )
    (state, params), _ = warmup.run(rng_key, jnp.zeros(d), num_steps=400)
    algo = blackjax_tpu.hmc(logdensity, **params)
    new_state, info = algo.step(rng_key, state)
    assert np.isfinite(float(info.acceptance_rate))
