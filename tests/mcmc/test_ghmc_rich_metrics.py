"""GHMC with rich momentum metrics: dense and low-rank inverse mass matrices
recover the moments of a correlated Gaussian, and the legacy per-dimension
inverse scale stays bit-compatible with ``gaussian_euclidean(scale**2)``
(mirrors the reference's ``tests/mcmc/test_sampling.py:1241-1340`` scenarios).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import metrics
from blackjax_tpu.mcmc.ghmc import _metric_from_momentum_inverse_scale
from blackjax_tpu.util import run_inference_algorithm
from jax.flatten_util import ravel_pytree

LOC = jnp.array([1.0, -2.0, 0.5])
_SCALE = jnp.array([1.0, 2.0, 0.5])
_CORR = jnp.array([[1.0, 0.6, -0.3], [0.6, 1.0, 0.2], [-0.3, 0.2, 1.0]])
COV = _CORR * _SCALE[:, None] * _SCALE[None, :]
_PREC = jnp.linalg.inv(COV)


def correlated_logdensity(x):
    delta = x - LOC
    return -0.5 * delta @ _PREC @ delta


def _sample_ghmc(momentum_inverse_scale, num_steps=8000, burnin=2000):
    algorithm = blackjax_tpu.ghmc(
        correlated_logdensity,
        step_size=0.3,
        momentum_inverse_scale=momentum_inverse_scale,
        alpha=0.8,
        # non-degenerate slice translation: a multiple of 2 freezes the
        # persistent slice variable on a correlated target
        delta=1.3,
    )
    init_key, sample_key = jax.random.split(jax.random.key(7))
    state = algorithm.init(LOC, init_key)
    _, positions = run_inference_algorithm(
        rng_key=sample_key,
        initial_state=state,
        inference_algorithm=algorithm,
        transform=lambda state, info: state.position,
        num_steps=num_steps,
    )
    return positions[burnin:]


def _check_moments(samples):
    np.testing.assert_allclose(jnp.mean(samples, axis=0), LOC, atol=0.35)
    np.testing.assert_allclose(jnp.cov(samples.T), COV, atol=0.6)


def test_ghmc_dense_metric_recovers_moments():
    """A dense (d, d) inverse mass matrix (the target covariance) mixes the
    correlated Gaussian and recovers both first and second moments."""
    _check_moments(_sample_ghmc(COV))


def test_ghmc_low_rank_metric_recovers_moments():
    """A rank-2 ``LowRankInverseMassMatrix`` built from the two strongest
    correlation eigendirections recovers mean and covariance."""
    sigma = jnp.sqrt(jnp.diagonal(COV))
    corr = COV / jnp.outer(sigma, sigma)
    eigenvalues, eigenvectors = jnp.linalg.eigh(corr)
    top = jnp.argsort(jnp.abs(eigenvalues - 1.0))[::-1][:2]
    imm = metrics.LowRankInverseMassMatrix(
        sigma=sigma, U=eigenvectors[:, top], lam=eigenvalues[top]
    )
    _check_moments(_sample_ghmc(imm))


def test_ghmc_metric_object_passthrough():
    """Passing a prebuilt ``Metric`` is accepted and samples correctly."""
    metric = metrics.gaussian_euclidean(jnp.diagonal(COV))
    _check_moments(_sample_ghmc(metric))


@pytest.mark.parametrize(
    "momentum_inverse_scale",
    [jnp.array(1.0), jnp.array([1.0, 2.0, 0.5])],
    ids=["scalar", "vector"],
)
def test_ghmc_legacy_diagonal_matches_gaussian_euclidean(momentum_inverse_scale):
    """Legacy per-dimension inverse *scale* input must reproduce
    ``gaussian_euclidean(scale**2)`` exactly — the squaring is applied only
    to the legacy input shape, never to the rich metric types."""
    metric = _metric_from_momentum_inverse_scale(momentum_inverse_scale)
    flat_scale = ravel_pytree(momentum_inverse_scale)[0]
    legacy = metrics.gaussian_euclidean(flat_scale**2)

    position = jnp.zeros_like(flat_scale)
    momentum = jnp.arange(flat_scale.shape[0], dtype=flat_scale.dtype) * 0.1
    key = jax.random.key(0)

    np.testing.assert_allclose(
        metric.kinetic_energy(momentum), legacy.kinetic_energy(momentum)
    )
    np.testing.assert_allclose(
        ravel_pytree(metric.sample_momentum(key, position))[0],
        ravel_pytree(legacy.sample_momentum(key, position))[0],
    )


def test_ghmc_dense_metric_not_squared():
    """A dense matrix input is used as the inverse mass matrix directly:
    its kinetic energy differs from the squared interpretation whenever the
    matrix is not idempotent."""
    dense = jnp.array([[2.0, 0.0, 0.0], [0.0, 3.0, 0.0], [0.0, 0.0, 4.0]])
    metric = _metric_from_momentum_inverse_scale(dense)
    momentum = jnp.array([1.0, 1.0, 1.0])
    expected = 0.5 * momentum @ dense @ momentum
    np.testing.assert_allclose(metric.kinetic_energy(momentum), expected, rtol=1e-6)
