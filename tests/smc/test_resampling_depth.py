"""Resampling scheme depth: distributional contracts beyond the one
unbiasedness check in ``test_smc.py`` (reference scenario class:
``tests/smc/test_resampling.py``).

Covered per scheme (systematic / stratified / multinomial / residual):
degenerate-weight exactness, ancestor-count variance ordering (the reason
systematic exists), integer-weight determinism of the residual floor,
subsampling (``num_samples != N``), sortedness of inverse-CDF schemes, and
dtype/shape contracts.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.smc import resampling

SCHEMES = {
    "systematic": resampling.systematic,
    "stratified": resampling.stratified,
    "multinomial": resampling.multinomial,
    "residual": resampling.residual,
}


def _counts(ancestors, n):
    return np.bincount(np.asarray(ancestors), minlength=n)


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_one_hot_weights_select_only_that_particle(name, rng_key):
    n = 64
    weights = jnp.zeros(n).at[17].set(1.0)
    ancestors = SCHEMES[name](rng_key, weights, n)
    assert ancestors.shape == (n,)
    np.testing.assert_array_equal(np.asarray(ancestors), 17)


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_ancestors_in_range_and_integer(name, rng_key):
    n = 50
    weights = jax.random.dirichlet(rng_key, jnp.ones(n))
    ancestors = SCHEMES[name](jax.random.fold_in(rng_key, 1), weights, n)
    a = np.asarray(ancestors)
    assert np.issubdtype(a.dtype, np.integer)
    assert a.min() >= 0 and a.max() < n


@pytest.mark.parametrize("name", ["systematic", "stratified"])
def test_grid_schemes_return_sorted_ancestors(name, rng_key):
    """Inverse-CDF grid schemes scan the CDF left-to-right: ancestors are
    non-decreasing (the property the sharded ring exchange relies on)."""
    n = 128
    weights = jax.random.dirichlet(rng_key, jnp.full(n, 0.5))
    ancestors = np.asarray(SCHEMES[name](jax.random.fold_in(rng_key, 2), weights, n))
    assert np.all(np.diff(ancestors) >= 0)


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_counts_unbiased_across_keys(name, rng_key):
    """E[count_i] = N w_i for every scheme (law of the resampling step)."""
    n, reps = 32, 600
    weights = jax.random.dirichlet(rng_key, jnp.ones(n) * 2.0)
    keys = jax.random.split(jax.random.fold_in(rng_key, 3), reps)
    anc = jax.vmap(lambda k: SCHEMES[name](k, weights, n))(keys)
    counts = jax.vmap(lambda a: jnp.bincount(a, length=n))(anc)
    mean_counts = np.asarray(jnp.mean(counts.astype(jnp.float64), axis=0))
    expected = n * np.asarray(weights)
    # multinomial is the noisiest: se(count_i) <= sqrt(n w_i (1-w_i)/reps)
    se = np.sqrt(np.maximum(expected * (1 - np.asarray(weights)), 1e-3) / reps)
    np.testing.assert_allclose(mean_counts, expected, atol=float(5 * se.max()))


def test_variance_ordering_systematic_leq_stratified_leq_multinomial(rng_key):
    """The classic variance ordering of ancestor counts — the whole point
    of the grid schemes (Douc, Cappe & Moulines 2005)."""
    n, reps = 32, 800
    weights = jax.random.dirichlet(rng_key, jnp.ones(n))
    keys = jax.random.split(jax.random.fold_in(rng_key, 4), reps)

    def count_var(scheme):
        anc = jax.vmap(lambda k: scheme(k, weights, n))(keys)
        counts = jax.vmap(lambda a: jnp.bincount(a, length=n))(anc)
        return float(jnp.mean(jnp.var(counts.astype(jnp.float64), axis=0)))

    v_sys = count_var(resampling.systematic)
    v_str = count_var(resampling.stratified)
    v_mult = count_var(resampling.multinomial)
    assert v_sys <= v_str * 1.15  # slack: same-order MC estimates
    assert v_str <= v_mult * 1.15
    assert v_sys < v_mult * 0.8  # and the ends are clearly separated


def test_residual_deterministic_floor(rng_key):
    """Integer parts of N*w are copied deterministically: with exact
    integer weights the output is exactly those copies, no randomness."""
    n = 16
    weights = jnp.zeros(n).at[3].set(0.5).at[7].set(0.25).at[11].set(0.25)
    for k in jax.random.split(rng_key, 3):
        counts = _counts(resampling.residual(k, weights, n), n)
        assert counts[3] == 8 and counts[7] == 4 and counts[11] == 4


def test_residual_fractional_remainder_is_multinomial(rng_key):
    """With fractional weights the floor copies appear always; the
    remainder slots vary by key but stay unbiased."""
    n = 8
    weights = jnp.asarray([0.3, 0.3, 0.15, 0.1, 0.05, 0.05, 0.03, 0.02])
    keys = jax.random.split(rng_key, 400)
    anc = jax.vmap(lambda k: resampling.residual(k, weights, n))(keys)
    counts = jax.vmap(lambda a: jnp.bincount(a, length=n))(anc)
    # floors always present
    floors = np.floor(n * np.asarray(weights)).astype(int)
    assert np.all(np.asarray(jnp.min(counts, axis=0)) >= floors)
    mean_counts = np.asarray(jnp.mean(counts.astype(jnp.float64), axis=0))
    np.testing.assert_allclose(mean_counts, n * np.asarray(weights), atol=0.3)


@pytest.mark.parametrize("name", sorted(SCHEMES))
@pytest.mark.parametrize("m", [8, 100])
def test_subsampling_and_oversampling_counts(name, m, rng_key):
    """num_samples != N: every scheme draws exactly m ancestors from the
    N-particle weight vector (the waste-free M-seeds path uses m < N)."""
    n = 32
    weights = jax.random.dirichlet(rng_key, jnp.ones(n))
    ancestors = SCHEMES[name](jax.random.fold_in(rng_key, 5), weights, m)
    a = np.asarray(ancestors)
    assert a.shape == (m,)
    assert a.min() >= 0 and a.max() < n


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_uniform_weights_near_identity_spread(name, rng_key):
    """Uniform weights: no particle may be copied catastrophically often
    (grid schemes give each exactly one copy; multinomial fluctuates)."""
    n = 64
    weights = jnp.full(n, 1.0 / n)
    counts = _counts(SCHEMES[name](rng_key, weights, n), n)
    if name in ("systematic", "stratified", "residual"):
        np.testing.assert_array_equal(counts, 1)
    else:
        assert counts.max() <= 8


@pytest.mark.parametrize("name", sorted(SCHEMES))
def test_jit_and_vmap_composable(name, rng_key):
    n = 16
    weights = jax.random.dirichlet(rng_key, jnp.ones(n))
    jitted = jax.jit(lambda k: SCHEMES[name](k, weights, n))
    keys = jax.random.split(rng_key, 4)
    batched = jax.vmap(jitted)(keys)
    assert batched.shape == (4, n)
    np.testing.assert_array_equal(
        np.asarray(jitted(keys[0])), np.asarray(batched[0])
    )
