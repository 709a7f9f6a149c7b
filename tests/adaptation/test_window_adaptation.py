"""Window-adaptation variant tests: dense metric, IMM seeding,
shrink-to-previous, fisher-diag recipe, multi-chain pooled warmup.

Parity model: reference ``tests/adaptation/test_adaptation.py``,
``test_window_adaptation_fisher_diag.py``, ``test_window_adaptation_imm_seed.py``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu

VARIANCES = jnp.array([0.25, 1.0, 4.0, 9.0])


def _logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def _corr_logdensity_factory(d=4, strength=8.0):
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + strength * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    return (lambda x: -0.5 * x @ prec @ x), cov


def test_window_adaptation_diagonal(rng_key):
    warmup = blackjax_tpu.window_adaptation(blackjax_tpu.nuts, _logdensity)
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=500)
    imm = np.asarray(params["inverse_mass_matrix"])
    assert imm.ndim == 1
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.5)
    assert 0.05 < float(params["step_size"]) < 5.0


def test_window_adaptation_dense_captures_correlation(rng_key):
    logdensity, cov = _corr_logdensity_factory()
    warmup = blackjax_tpu.window_adaptation(
        blackjax_tpu.nuts, logdensity, is_mass_matrix_diagonal=False
    )
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=600)
    imm = np.asarray(params["inverse_mass_matrix"])
    assert imm.shape == (4, 4)
    # off-diagonals must pick up the planted positive correlation
    off = imm[np.triu_indices(4, 1)]
    assert (off > 0.2).all()
    np.testing.assert_allclose(imm, np.asarray(cov), rtol=0.6)


def test_window_adaptation_imm_seed_validation():
    with pytest.raises(ValueError, match="wrong number of dimensions"):
        blackjax_tpu.window_adaptation(
            blackjax_tpu.nuts,
            _logdensity,
            initial_inverse_mass_matrix=jnp.eye(4),  # dense seed, diag mode
        )
    with pytest.raises(ValueError, match="imm_shrinkage"):
        blackjax_tpu.window_adaptation(
            blackjax_tpu.nuts, _logdensity, imm_shrinkage_to_previous=-1.0
        )


def test_window_adaptation_imm_seed_improves_short_warmup(rng_key):
    """With a very short warmup the seeded IMM dominates the estimate."""
    seed_imm = jnp.asarray(VARIANCES)
    warmup = blackjax_tpu.window_adaptation(
        blackjax_tpu.nuts,
        _logdensity,
        initial_inverse_mass_matrix=seed_imm,
        imm_shrinkage_to_previous=200.0,  # trust the seed heavily
    )
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=120)
    imm = np.asarray(params["inverse_mass_matrix"])
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.35)


def test_window_adaptation_multichain_pooled(rng_key):
    """n_chains > 1: one shared step size, metric pooled over the ensemble."""
    n_chains = 16
    warmup = blackjax_tpu.window_adaptation(
        blackjax_tpu.nuts, _logdensity, n_chains=n_chains
    )
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (n_chains, 4))
    (state, params), _ = warmup.run(warm_key, positions, num_steps=400)
    imm = np.asarray(params["inverse_mass_matrix"])
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.5)
    # the returned state keeps the chain axis
    assert state.position.shape == (n_chains, 4)
