"""Metric-stack breadth: input validation, dim-1/dim-2 exactness, the scale
flag grid, low-rank/diagonal degeneracies, turning-check unit cases, and
L-BFGS adapter structure.

Scenario parity target: the reference's ``tests/mcmc/test_metrics.py``
(CovarianceFormatting, GaussianEuclidean dim cases, scale ff/ft/tf/tt grid,
low-rank diagonal equivalence, turning unit cases, adapter contracts).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc import metrics
from blackjax_tpu.mcmc.metrics import (
    LowRankInverseMassMatrix,
    default_metric,
    gaussian_euclidean,
    gaussian_euclidean_low_rank,
    gaussian_riemannian,
)

# exactness pins run in both precision passes: full precision under x64,
# f32 rounding (with a cholesky/inverse chain) otherwise
RTOL_EXACT = 1e-8 if jax.config.jax_enable_x64 else 2e-4

# ---------------------------------------------------------------------------
# input validation and dim-1/dim-2 exactness
# ---------------------------------------------------------------------------


def test_invalid_mass_matrix_ndim_raises():
    with pytest.raises(ValueError):
        gaussian_euclidean(jnp.ones((2, 2, 2)))


def test_dim1_diag_momentum_and_energy(rng_key):
    """d=1 diagonal IMM = [4]: momentum sd = 1/2, KE = 2 p^2."""
    metric = gaussian_euclidean(jnp.array([4.0]))
    draws = jax.vmap(lambda k: metric.sample_momentum(k, jnp.zeros(1)))(
        jax.random.split(rng_key, 20000)
    )
    np.testing.assert_allclose(np.asarray(draws).std(), 0.5, rtol=0.05)
    p = jnp.array([3.0])
    np.testing.assert_allclose(float(metric.kinetic_energy(p)), 0.5 * 4.0 * 9.0)


def test_dim2_dense_matches_diag_when_diagonal(rng_key):
    imm_diag = jnp.array([0.5, 2.0])
    dense = gaussian_euclidean(jnp.diag(imm_diag))
    diag = gaussian_euclidean(imm_diag)
    p = jnp.array([1.3, -0.4])
    np.testing.assert_allclose(
        float(dense.kinetic_energy(p)), float(diag.kinetic_energy(p)), rtol=1e-12
    )
    # same momentum distribution: identical covariance against many draws
    dd = jax.vmap(lambda k: dense.sample_momentum(k, jnp.zeros(2)))(
        jax.random.split(rng_key, 20000)
    )
    np.testing.assert_allclose(
        np.cov(np.asarray(dd), rowvar=False),
        np.diag(1.0 / np.asarray(imm_diag)),
        atol=0.05,
    )


def test_riemannian_requires_callable_and_matches_fixed(rng_key):
    """A constant mass-matrix function reproduces the Euclidean KE up to the
    position-dependent normalizer (which is constant here)."""
    M = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    riem = gaussian_riemannian(lambda q: M)
    p = jnp.array([0.7, -1.1])
    q = jnp.zeros(2)
    ke_riem = float(riem.kinetic_energy(p, position=q))
    # Riemannian KE includes 0.5 logdet(M) + const normalizer terms
    expected = (
        0.5 * float(p @ jnp.linalg.inv(M) @ p)
        + 0.5 * float(jnp.linalg.slogdet(M)[1])
        + 0.5 * 2 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(ke_riem, expected, rtol=RTOL_EXACT)


def test_riemannian_kinetic_energy_requires_position():
    riem = gaussian_riemannian(lambda q: jnp.eye(2) * (1.0 + q @ q))
    with pytest.raises(ValueError, match="position"):
        riem.kinetic_energy(jnp.ones(2))


# ---------------------------------------------------------------------------
# the scale flag grid (inv x trans), dense and low-rank
# ---------------------------------------------------------------------------


def _operator_matrix(metric, d, **flags):
    """Materialize the scale operator by applying it to the basis."""
    cols = [
        np.asarray(metric.scale(jnp.zeros(d), jnp.eye(d)[:, i], **flags))
        for i in range(d)
    ]
    return np.stack(cols, axis=1)


def test_scale_flag_grid_dense():
    """The four (inv, trans) spellings are mutually consistent (reference
    semantics: inv applies the triangular factor of M^{-1}, NOT the literal
    inverse of the M^{1/2} factor): F F^T = M, G G^T = M^{-1}, trans
    transposes each, and the two factors couple as inv(F) = G^T."""
    imm = jnp.array([[1.0, 0.4], [0.4, 2.0]])
    m = np.linalg.inv(np.asarray(imm))
    metric = gaussian_euclidean(imm)
    F = _operator_matrix(metric, 2, inv=False, trans=False)
    Ft = _operator_matrix(metric, 2, inv=False, trans=True)
    G = _operator_matrix(metric, 2, inv=True, trans=False)
    Gt = _operator_matrix(metric, 2, inv=True, trans=True)
    np.testing.assert_allclose(F @ F.T, m, rtol=RTOL_EXACT)
    np.testing.assert_allclose(G @ G.T, np.asarray(imm), rtol=RTOL_EXACT)
    np.testing.assert_allclose(Ft, F.T, rtol=RTOL_EXACT)
    np.testing.assert_allclose(Gt, G.T, rtol=RTOL_EXACT)
    np.testing.assert_allclose(np.linalg.inv(F), G.T, rtol=RTOL_EXACT)


def test_scale_inverse_roundtrip_low_rank(rng_key):
    """scale(inv=True) inverts scale(inv=False) exactly in O(dk) form."""
    d, k = 8, 2
    sigma = jnp.abs(jax.random.normal(rng_key, (d,))) + 0.5
    U, _ = jnp.linalg.qr(jax.random.normal(jax.random.fold_in(rng_key, 1), (d, k)))
    lam = jnp.array([6.0, 3.0])
    metric = gaussian_euclidean_low_rank(sigma, U, lam)
    e = jax.random.normal(jax.random.fold_in(rng_key, 2), (d,))
    for trans in (False, True):
        # the factors couple transposed (G^T F = I — D and the low-rank
        # correction do not commute), mirroring the dense inv(F) = G^T
        fwd = metric.scale(jnp.zeros(d), e, inv=False, trans=trans)
        back = metric.scale(jnp.zeros(d), fwd, inv=True, trans=not trans)
        np.testing.assert_allclose(np.asarray(back), np.asarray(e), rtol=RTOL_EXACT)


def test_low_rank_identity_lam_matches_pure_diagonal(rng_key):
    """lam == 1 collapses the low-rank correction: the metric must equal the
    diagonal Euclidean metric built from sigma^2."""
    d, k = 6, 2
    sigma = jnp.abs(jax.random.normal(rng_key, (d,))) + 0.5
    U, _ = jnp.linalg.qr(jax.random.normal(jax.random.fold_in(rng_key, 1), (d, k)))
    lr = gaussian_euclidean_low_rank(sigma, U, jnp.ones(k))
    diag = gaussian_euclidean(sigma**2)
    p = jax.random.normal(jax.random.fold_in(rng_key, 2), (d,))
    np.testing.assert_allclose(
        float(lr.kinetic_energy(p)), float(diag.kinetic_energy(p)), rtol=RTOL_EXACT
    )
    key = jax.random.fold_in(rng_key, 3)
    np.testing.assert_allclose(
        np.asarray(lr.sample_momentum(key, jnp.zeros(d))),
        np.asarray(diag.sample_momentum(key, jnp.zeros(d))),
        rtol=RTOL_EXACT,
    )


def test_low_rank_kinetic_energy_matches_dense_expansion(rng_key):
    d, k = 7, 3
    sigma = jnp.abs(jax.random.normal(rng_key, (d,))) + 0.5
    U, _ = jnp.linalg.qr(jax.random.normal(jax.random.fold_in(rng_key, 1), (d, k)))
    lam = jnp.array([9.0, 4.0, 2.0])
    dense_imm = jnp.diag(sigma) @ (
        jnp.eye(d) + U @ jnp.diag(lam - 1.0) @ U.T
    ) @ jnp.diag(sigma)
    lr = gaussian_euclidean_low_rank(sigma, U, lam)
    dense = gaussian_euclidean(dense_imm)
    p = jax.random.normal(jax.random.fold_in(rng_key, 2), (d,))
    np.testing.assert_allclose(
        float(lr.kinetic_energy(p)), float(dense.kinetic_energy(p)), rtol=RTOL_EXACT
    )


# ---------------------------------------------------------------------------
# turning-check unit cases
# ---------------------------------------------------------------------------


def test_is_turning_detects_reversal():
    metric = gaussian_euclidean(jnp.ones(2))
    fwd = jnp.array([1.0, 0.0])
    # endpoint momenta disagree and the trajectory sum opposes the left
    # endpoint: generalized U-turn criterion fires
    assert bool(metric.check_turning(fwd, -2.0 * fwd, -fwd))
    # aligned momenta: no turn
    assert not bool(metric.check_turning(fwd, fwd, 2.0 * fwd))


def test_is_turning_orthogonal_edge():
    """Orthogonal momentum sum gives exactly zero dot products: the check
    uses <= so the edge counts as turning (reference semantics)."""
    metric = gaussian_euclidean(jnp.ones(2))
    fwd = jnp.array([1.0, 0.0])
    orth = jnp.array([0.0, 1.0])
    assert bool(metric.check_turning(fwd, fwd, orth))


# ---------------------------------------------------------------------------
# L-BFGS adapter structure
# ---------------------------------------------------------------------------


def test_lbfgs_adapter_orthonormal_u_and_sigma(rng_key):
    from blackjax_tpu.mcmc.metrics import lbfgs_inverse_hessian_to_low_rank_metric
    from blackjax_tpu.optimizers.lbfgs import lbfgs_inverse_hessian_factors

    d, m = 10, 4
    S = jax.random.normal(rng_key, (d, m)) * 0.1
    Z = S + 0.01 * jax.random.normal(jax.random.fold_in(rng_key, 1), (d, m))
    alpha = jnp.abs(jax.random.normal(jax.random.fold_in(rng_key, 2), (d,))) + 0.5
    beta, gamma = lbfgs_inverse_hessian_factors(S, Z, alpha)
    imm = lbfgs_inverse_hessian_to_low_rank_metric(alpha, beta, gamma)
    assert isinstance(imm, LowRankInverseMassMatrix)
    np.testing.assert_allclose(
        np.asarray(imm.sigma), np.sqrt(np.asarray(alpha)), rtol=RTOL_EXACT
    )
    U = np.asarray(imm.U)
    np.testing.assert_allclose(U.T @ U, np.eye(U.shape[1]), atol=1e-8 if jax.config.jax_enable_x64 else 1e-4)
    assert (np.asarray(imm.lam) > 0).all()


def test_default_metric_dispatch_low_rank_namedtuple(rng_key):
    d, k = 5, 2
    sigma = jnp.ones(d)
    U, _ = jnp.linalg.qr(jax.random.normal(rng_key, (d, k)))
    imm = LowRankInverseMassMatrix(sigma=sigma, U=U, lam=jnp.array([4.0, 2.0]))
    metric = default_metric(imm)
    assert isinstance(metric, metrics.Metric)
    p = jax.random.normal(jax.random.fold_in(rng_key, 1), (d,))
    assert np.isfinite(float(metric.kinetic_energy(p)))
