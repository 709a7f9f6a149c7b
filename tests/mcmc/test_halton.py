"""Halton / van der Corput jitter-sequence units.

Scenario parity target: the reference's quasi-random trajectory-length
machinery (``/root/reference/blackjax/mcmc/dynamic_hmc.py:205``) used by
ChEES-HMC; no reference test pins it directly, so these pin the defining
low-discrepancy properties instead.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc.dynamic_hmc import (
    halton_sequence,
    halton_trajectory_length,
    rescale,
)


def _seq(n, max_bits=10):
    idx = jnp.arange(n, dtype=jnp.int32)
    return np.asarray(jax.vmap(lambda i: halton_sequence(i, max_bits))(idx))


def test_first_elements_are_bit_reversed_binary():
    """Base-2 van der Corput: 1/2, 1/4, 3/4, 1/8, 5/8, 3/8, 7/8, ..."""
    np.testing.assert_allclose(
        _seq(7), [0.5, 0.25, 0.75, 0.125, 0.625, 0.375, 0.875], atol=1e-12
    )


def test_values_lie_in_open_unit_interval():
    s = _seq(256)
    assert s.min() > 0.0 and s.max() < 1.0


def test_low_discrepancy_beats_iid_bound():
    """Every length-n prefix has |empirical CDF - uniform| = O(log n / n);
    check a concrete bound far below the IID sqrt(n) scale."""
    s = _seq(128)
    for t in (0.25, 0.5, 0.75):
        assert abs(np.mean(s < t) - t) < 0.04


def test_full_period_is_the_dyadic_grid():
    """Over a full 2^b period the sequence (bit reversal of i+1 over b bits)
    is a permutation of {k/2^b : k = 0..2^b-1} — the 0.0 landing exactly
    once, at the wrap index i = 2^b - 1 where i+1 overflows the b-bit
    window. Mean is exactly (2^b - 1)/2^{b+1}."""
    b = 6
    s = _seq(2**b, max_bits=b)
    np.testing.assert_allclose(np.sort(s), np.arange(2**b) / 2**b, atol=1e-12)
    assert s[2**b - 1] == 0.0
    np.testing.assert_allclose(s.mean(), (2**b - 1) / 2 ** (b + 1), atol=1e-12)


def test_distinct_within_period():
    s = _seq(2**6, max_bits=6)
    assert len(np.unique(s)) == 2**6


def test_max_bits_must_fit_dtype():
    with pytest.raises(ValueError):
        halton_sequence(jnp.asarray(0, jnp.int32), max_bits=32)


def test_trajectory_length_mean_tracks_adjustment():
    """halton_trajectory_length: rint(0.5 + u * rescale(mu)) has mean ~mu
    over a full quasi-random period (the ChEES average-length contract) and
    never exceeds rescale(mu) = 2*mu - 1."""
    idx = jnp.arange(2**10, dtype=jnp.int32)
    for mu in (4.0, 10.0, 25.0):
        lengths = np.asarray(
            jax.vmap(lambda i: halton_trajectory_length(i, mu))(idx)
        )
        np.testing.assert_allclose(lengths.mean(), mu, rtol=0.05)
        assert lengths.max() <= int(rescale(mu))
        assert lengths.min() >= 0  # u ~ 0 rounds to 0 (documented behavior)


def test_rescale_gives_exact_discrete_mean():
    """rescale solves for the scale s.t. the discretized uniform mean is mu:
    mean over u~U(0,1) of rint(0.5 + u*s) -> mu ... pinned numerically
    against a dense grid."""
    for mu in (3.0, 7.5):
        scale = float(rescale(mu))
        u = (np.arange(200_000) + 0.5) / 200_000
        np.testing.assert_allclose(
            np.rint(0.5 + u * scale).mean(), mu, rtol=1e-3
        )
