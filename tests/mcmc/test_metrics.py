"""Metric algebra: sampling covariance, kinetic energy, scale round-trips,
low-rank vs dense equivalence."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc import metrics

# exact-algebra tolerances scale with the working precision: last-ulp checks
# in x64, proportionally looser in the f32 pass (BJT_TEST_X64=0)
TIGHT = 1e-10 if jax.config.jax_enable_x64 else 2e-6
LOOSE = 1e-6 if jax.config.jax_enable_x64 else 2e-4


def _dense_from_low_rank(sigma, U, lam):
    d = sigma.shape[0]
    inner = np.eye(d) + U @ np.diag(lam - 1.0) @ U.T
    return np.diag(sigma) @ inner @ np.diag(sigma)


@pytest.mark.parametrize("kind", ["diag", "dense"])
def test_momentum_covariance_matches_mass_matrix(kind, rng_key):
    d = 4
    rng = np.random.default_rng(0)
    if kind == "diag":
        imm = jnp.asarray(rng.uniform(0.5, 2.0, d))
        mass = np.diag(1.0 / np.asarray(imm))
    else:
        A = rng.normal(size=(d, d))
        imm = jnp.asarray(A @ A.T + d * np.eye(d))
        mass = np.linalg.inv(np.asarray(imm))
    metric = metrics.gaussian_euclidean(imm)
    keys = jax.random.split(rng_key, 20_000)
    position = jnp.zeros(d)
    samples = jax.vmap(lambda k: metric.sample_momentum(k, position))(keys)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_cov, mass, atol=0.05 * np.abs(mass).max() + 0.02)


@pytest.mark.parametrize("kind", ["diag", "dense"])
def test_kinetic_energy_quadratic_form(kind):
    d = 4
    rng = np.random.default_rng(1)
    if kind == "diag":
        imm = jnp.asarray(rng.uniform(0.5, 2.0, d))
        imm_dense = np.diag(np.asarray(imm))
    else:
        A = rng.normal(size=(d, d))
        imm = jnp.asarray(A @ A.T + d * np.eye(d))
        imm_dense = np.asarray(imm)
    metric = metrics.gaussian_euclidean(imm)
    p = jnp.asarray(rng.normal(size=d))
    expected = 0.5 * np.asarray(p) @ imm_dense @ np.asarray(p)
    np.testing.assert_allclose(metric.kinetic_energy(p), expected, rtol=TIGHT)


def test_low_rank_matches_dense_metric(rng_key):
    d, k = 6, 2
    rng = np.random.default_rng(2)
    sigma = rng.uniform(0.5, 1.5, d)
    Q, _ = np.linalg.qr(rng.normal(size=(d, k)))
    lam = np.array([5.0, 0.2])
    imm_dense = _dense_from_low_rank(sigma, Q, lam)

    lr = metrics.gaussian_euclidean_low_rank(
        jnp.asarray(sigma), jnp.asarray(Q), jnp.asarray(lam)
    )
    dense = metrics.gaussian_euclidean(jnp.asarray(imm_dense))

    p = jnp.asarray(rng.normal(size=d))
    np.testing.assert_allclose(
        lr.kinetic_energy(p), dense.kinetic_energy(p), rtol=TIGHT * 100
    )

    # same turning decision on random inputs
    for i in range(5):
        ml = jnp.asarray(rng.normal(size=d))
        mr = jnp.asarray(rng.normal(size=d))
        ms = jnp.asarray(rng.normal(size=d))
        assert bool(lr.check_turning(ml, mr, ms)) == bool(
            dense.check_turning(ml, mr, ms)
        )

    # momentum samples have covariance M
    keys = jax.random.split(rng_key, 20_000)
    samples = jax.vmap(lambda key: lr.sample_momentum(key, jnp.zeros(d)))(keys)
    mass = np.linalg.inv(imm_dense)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_cov, mass, atol=0.08 * np.abs(mass).max() + 0.03)


def test_low_rank_scale_consistency():
    """scale(inv=False) ∘ scale(inv=True) should be the identity map and
    M^{1/2} (M^{1/2})^T = M."""
    d, k = 5, 2
    rng = np.random.default_rng(3)
    sigma = rng.uniform(0.5, 1.5, d)
    Q, _ = np.linalg.qr(rng.normal(size=(d, k)))
    lam = np.array([3.0, 0.5])
    lr = metrics.gaussian_euclidean_low_rank(
        jnp.asarray(sigma), jnp.asarray(Q), jnp.asarray(lam)
    )
    e = jnp.asarray(rng.normal(size=d))
    forward = lr.scale(None, e, inv=False, trans=False)
    # the factors are non-symmetric: (M^{1/2})^{-1} = (M^{-1/2})^T
    back = lr.scale(None, forward, inv=True, trans=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(e), rtol=TIGHT * 100)

    # M^{1/2} (M^{1/2})^T e == M e
    imm_dense = _dense_from_low_rank(sigma, Q, lam)
    mass = np.linalg.inv(imm_dense)
    mt_e = lr.scale(None, e, inv=False, trans=True)
    m_mt_e = lr.scale(None, mt_e, inv=False, trans=False)
    np.testing.assert_allclose(np.asarray(m_mt_e), mass @ np.asarray(e), rtol=LOOSE)


def test_default_metric_dispatch():
    diag = metrics.default_metric(jnp.ones(3))
    assert isinstance(diag, metrics.Metric)
    lr_payload = metrics.LowRankInverseMassMatrix(
        jnp.ones(3), jnp.eye(3)[:, :1], jnp.ones(1)
    )
    assert isinstance(metrics.default_metric(lr_payload), metrics.Metric)
    assert metrics.default_metric(diag) is diag
    riem = metrics.default_metric(lambda q: jnp.ones(3))
    assert isinstance(riem, metrics.Metric)


def test_riemannian_kinetic_energy_includes_logdet():
    mass_fn = lambda q: jnp.exp(q)  # diagonal position-dependent mass
    metric = metrics.gaussian_riemannian(mass_fn)
    q = jnp.array([0.3, -0.2])
    p = jnp.array([0.5, 1.0])
    mass = np.exp(np.asarray(q))
    expected = 0.5 * (
        np.sum(np.asarray(p) ** 2 / mass)
        + np.sum(np.log(mass))
        + 2 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(metric.kinetic_energy(p, position=q), expected, rtol=TIGHT * 100)


def test_lbfgs_adapter_reconstructs_inverse_hessian():
    d, m = 6, 2
    rng = np.random.default_rng(4)
    alpha = rng.uniform(0.5, 2.0, d)
    beta = rng.normal(size=(d, 2 * m))
    gamma = rng.normal(size=(2 * m, 2 * m))
    gamma = 0.1 * (gamma + gamma.T)
    target = np.diag(alpha) + beta @ gamma @ beta.T
    # keep it SPD
    w = np.linalg.eigvalsh(target)
    if w.min() <= 1e-6:
        gamma *= 0.01
        target = np.diag(alpha) + beta @ gamma @ beta.T
    payload = metrics.lbfgs_inverse_hessian_to_low_rank_metric(
        jnp.asarray(alpha), jnp.asarray(beta), jnp.asarray(gamma)
    )
    reconstructed = _dense_from_low_rank(
        np.asarray(payload.sigma), np.asarray(payload.U), np.asarray(payload.lam)
    )
    np.testing.assert_allclose(reconstructed, target, rtol=LOOSE, atol=LOOSE * 0.01)
