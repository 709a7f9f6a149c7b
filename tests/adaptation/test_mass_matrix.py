"""Direct Welford / mass-matrix adaptation algebra (parity model:
reference ``tests/adaptation`` Welford-vs-numpy checks)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.mass_matrix import (
    mass_matrix_adaptation,
    welford_algorithm,
)

TIGHT = 1e-9 if jax.config.jax_enable_x64 else 1e-4


def test_welford_diag_matches_numpy(rng_key):
    init, update, final = welford_algorithm(is_diagonal_matrix=True)
    xs = np.asarray(jax.random.normal(rng_key, (200, 6))) * np.arange(1, 7)
    state = init(6)
    for row in xs:
        state = update(state, jnp.asarray(row))
    cov, n, mean = final(state)
    assert int(n) == 200
    np.testing.assert_allclose(np.asarray(mean), xs.mean(0), rtol=TIGHT, atol=TIGHT)
    np.testing.assert_allclose(np.asarray(cov), xs.var(0, ddof=1), rtol=TIGHT * 10)


def test_welford_dense_matches_numpy(rng_key):
    init, update, final = welford_algorithm(is_diagonal_matrix=False)
    z = np.asarray(jax.random.normal(rng_key, (300, 3)))
    mix = np.array([[1.0, 0.5, 0.0], [0.0, 1.0, -0.3], [0.2, 0.0, 1.0]])
    xs = z @ mix.T
    state = init(3)
    for row in xs:
        state = update(state, jnp.asarray(row))
    cov, n, mean = final(state)
    np.testing.assert_allclose(np.asarray(cov), np.cov(xs.T), rtol=TIGHT * 100)


def test_welford_batched_equals_sequential(rng_key):
    """One batched update of B rows must equal B sequential updates (the
    Chan-Golub-LeVeque merge identity)."""
    init, update, final = welford_algorithm(is_diagonal_matrix=True)
    xs = jax.random.normal(rng_key, (40, 4)) * jnp.array([1.0, 2.0, 0.5, 3.0])

    seq = init(4)
    for row in np.asarray(xs):
        seq = update(seq, jnp.asarray(row))

    # warm-start then merge the rest as one batch
    half = init(4)
    for row in np.asarray(xs[:10]):
        half = update(half, jnp.asarray(row))
    batched = update(half, xs[10:])

    np.testing.assert_allclose(
        np.asarray(batched.mean), np.asarray(seq.mean), rtol=TIGHT * 10
    )
    np.testing.assert_allclose(
        np.asarray(batched.m2), np.asarray(seq.m2), rtol=TIGHT * 100
    )
    assert int(batched.sample_size) == int(seq.sample_size) == 40


def test_mass_matrix_stan_regularization(rng_key):
    """final() must apply Stan's shrink-to-unit formula
    (n/(n+5))*cov + 1e-3*(5/(n+5)) and reset the accumulator."""
    init, update, final = mass_matrix_adaptation(is_diagonal_matrix=True)
    xs = np.asarray(jax.random.normal(rng_key, (100, 3))) * np.array([1.0, 3.0, 0.2])
    state = init(3)
    for row in xs:
        state = update(state, jnp.asarray(row))
    state = final(state)
    n = 100
    expected = (n * xs.var(0, ddof=1) + 1e-3 * 5) / (n + 5)
    np.testing.assert_allclose(
        np.asarray(state.inverse_mass_matrix), expected, rtol=1e-5
    )
    assert int(state.wc_state.sample_size) == 0  # window reset


def test_mass_matrix_shrink_to_previous(rng_key):
    """The shrink-to-previous pseudo-count pulls the new window's estimate
    toward the previous IMM."""
    init, update, final = mass_matrix_adaptation(
        is_diagonal_matrix=True, imm_shrinkage_to_previous=1000.0
    )
    prev = jnp.array([7.0, 7.0])
    state = init(2, initial_inverse_mass_matrix=prev)
    xs = np.asarray(jax.random.normal(rng_key, (50, 2)))
    for row in xs:
        state = update(state, jnp.asarray(row))
    state = final(state)
    # with s >> n the result stays near the previous value
    np.testing.assert_allclose(
        np.asarray(state.inverse_mass_matrix), np.asarray(prev), rtol=0.2
    )


def test_fisher_estimator_validates():
    with pytest.raises(ValueError, match="diagonal"):
        mass_matrix_adaptation(is_diagonal_matrix=False, diagonal_estimator="fisher")
    with pytest.raises(ValueError, match="welford"):
        mass_matrix_adaptation(diagonal_estimator="nope")
