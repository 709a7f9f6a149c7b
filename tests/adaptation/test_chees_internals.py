"""ChEES-adaptation internals: mass-matrix option validation and bit-parity,
the whitened-criterion identity reduction, power-iteration eigenvalue
recovery, and length-floor arithmetic.

Scenario parity target: the reference's ``tests/adaptation/test_adaptation.py``
(mass-matrix estimation gating, whitened criterion, length floor, power
iteration).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.chees_adaptation import (
    CHEES_LENGTH_FLOOR_FACTOR,
    _apply_length_floor,
    _eig_state_init,
    _power_iteration_lambda_max,
    _recompute_eig_state,
)

VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


# ---------------------------------------------------------------------------
# option validation and parity
# ---------------------------------------------------------------------------


def test_mass_matrix_estimation_invalid_value_raises():
    with pytest.raises(ValueError, match="mass_matrix_estimation"):
        blackjax_tpu.chees_adaptation(
            logdensity, 8, mass_matrix_estimation="dense"
        )


def test_mass_matrix_window_fraction_invalid_raises():
    with pytest.raises(ValueError, match="window_fraction"):
        blackjax_tpu.chees_adaptation(
            logdensity, 8, mass_matrix_estimation="diagonal",
            mass_matrix_window_fraction=1.5,
        )


def test_length_floor_requires_diagonal_metric():
    with pytest.raises(ValueError, match="diagonal"):
        blackjax_tpu.chees_adaptation(logdensity, 8, _length_floor=True)


def test_mass_matrix_none_matches_omitted_bit_for_bit(rng_key):
    """``mass_matrix_estimation=None`` must be the literal default path —
    identical tuned parameters AND final states under the same key."""
    num_chains = 16
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4))

    def run(**kwargs):
        warmup = blackjax_tpu.chees_adaptation(logdensity, num_chains, **kwargs)
        (states, params), _ = warmup.run(
            warm_key, positions, 0.1, optax.adam(0.25), 120
        )
        return states, params

    s_default, p_default = run()
    s_none, p_none = run(mass_matrix_estimation=None)
    np.testing.assert_array_equal(
        np.asarray(p_default["step_size"]), np.asarray(p_none["step_size"])
    )
    np.testing.assert_array_equal(
        np.asarray(s_default.position), np.asarray(s_none.position)
    )


def test_estimated_metric_engages_and_tracks_variances(rng_key):
    """With diagonal estimation on, the returned IMM leaves the identity and
    tracks the target variances (the engagement gate passed)."""
    num_chains = 64
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0
    warmup = blackjax_tpu.chees_adaptation(
        logdensity, num_chains, mass_matrix_estimation="diagonal"
    )
    (_, params), _ = warmup.run(warm_key, positions, 0.1, optax.adam(0.25), 400)
    imm = np.asarray(params["inverse_mass_matrix"])
    assert not np.allclose(imm, 1.0)
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.5)


# ---------------------------------------------------------------------------
# power iteration and eig-state refresh
# ---------------------------------------------------------------------------


def test_power_iteration_recovers_planted_eigenpair(rng_key):
    d = 6
    v = jnp.ones(d) / jnp.sqrt(d)
    matrix = jnp.eye(d) + 30.0 * jnp.outer(v, v)
    lam, vec = _power_iteration_lambda_max(
        matrix, _eig_state_init(d).eigenvector, 30
    )
    np.testing.assert_allclose(float(lam), 31.0, rtol=1e-6)
    assert abs(float(vec @ v)) > 0.999


def test_eig_state_warm_start_converges_faster(rng_key):
    """A second refresh warm-started from the first gets closer to the true
    eigenvalue than a single cold refresh with the same iteration budget."""
    d = 8
    v = jax.random.normal(rng_key, (d,))
    v = v / jnp.linalg.norm(v)
    cov = jnp.eye(d) + 20.0 * jnp.outer(v, v)
    n = 1000.0
    m2 = cov * (n - 1.0)
    imm = jnp.ones(d)

    cold = _recompute_eig_state(n, jnp.zeros(d), m2, imm, _eig_state_init(d), 2)
    warm = _recompute_eig_state(n, jnp.zeros(d), m2, imm, cold, 2)
    true_lam = 21.0
    assert abs(float(warm.lambda_max) - true_lam) <= abs(
        float(cold.lambda_max) - true_lam
    )
    np.testing.assert_allclose(float(warm.lambda_max), true_lam, rtol=0.05)


def test_eig_refresh_whitens_by_the_engaged_metric():
    """With IMM equal to the covariance diagonal, the whitened matrix is a
    correlation matrix: lambda_max of a diagonal covariance becomes 1."""
    d = 5
    diag_cov = jnp.diag(jnp.array([9.0, 4.0, 1.0, 0.25, 16.0]))
    n = 500.0
    state = _recompute_eig_state(
        n,
        jnp.zeros(d),
        diag_cov * (n - 1.0),
        jnp.diag(diag_cov),
        _eig_state_init(d),
        20,
    )
    np.testing.assert_allclose(float(state.lambda_max), 1.0, rtol=1e-6)


# ---------------------------------------------------------------------------
# length-floor arithmetic
# ---------------------------------------------------------------------------


def test_apply_length_floor_arithmetic():
    step_size = 0.1
    cap_steps = 100  # cap = 10.0
    # engaged, floor above the adapted length: floored to (pi/2) sqrt(lam)
    lam = jnp.asarray(16.0)
    consumed, clipped = _apply_length_floor(
        jnp.asarray(1.0), lam, jnp.asarray(True), True, cap_steps, step_size
    )
    np.testing.assert_allclose(
        float(consumed), CHEES_LENGTH_FLOOR_FACTOR * 4.0,
        rtol=1e-12 if jax.config.jax_enable_x64 else 1e-6,
    )
    assert not bool(clipped)
    # adapted length above the floor: untouched
    consumed, _ = _apply_length_floor(
        jnp.asarray(9.0), lam, jnp.asarray(True), True, cap_steps, step_size
    )
    np.testing.assert_allclose(float(consumed), 9.0, rtol=1e-12 if jax.config.jax_enable_x64 else 1e-6)
    # floor beyond the leapfrog budget: capped and flagged
    consumed, clipped = _apply_length_floor(
        jnp.asarray(1.0), jnp.asarray(1e6), jnp.asarray(True), True,
        cap_steps, step_size,
    )
    np.testing.assert_allclose(float(consumed), 10.0, rtol=1e-12 if jax.config.jax_enable_x64 else 1e-6)
    assert bool(clipped)


def test_apply_length_floor_inert_before_engagement():
    """Not engaged: the floor is zero (adapted length passes through);
    disabled: the seam is the identity."""
    consumed, clipped = _apply_length_floor(
        jnp.asarray(0.7), jnp.asarray(100.0), jnp.asarray(False), True, 100, 0.1
    )
    np.testing.assert_allclose(float(consumed), 0.7, rtol=1e-12 if jax.config.jax_enable_x64 else 1e-6)
    assert not bool(clipped)
    consumed, clipped = _apply_length_floor(
        jnp.asarray(0.7), jnp.asarray(100.0), jnp.asarray(True), False, 100, 0.1
    )
    np.testing.assert_allclose(float(consumed), 0.7, rtol=1e-12 if jax.config.jax_enable_x64 else 1e-6)
    assert not bool(clipped)
