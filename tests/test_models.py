"""Benchmark/model targets: every registered target must expose a finite,
differentiable logdensity at a generic point, and the analytic ones must
score known points correctly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.models import targets


@pytest.mark.parametrize(
    "factory",
    [
        lambda: targets.standard_normal(6),
        lambda: targets.ill_conditioned_gaussian(12, condition_number=50.0),
        lambda: targets.hierarchical_gaussian(10),
        lambda: targets.eight_schools_noncentered(),
    ],
)
def test_targets_finite_and_differentiable(factory, rng_key):
    t = factory()
    x = 0.1 * jax.random.normal(rng_key, (t.dim,))
    val = t.logdensity_fn(x)
    grad = jax.grad(t.logdensity_fn)(x)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert grad.shape == (t.dim,)


def test_standard_normal_scores_exactly():
    t = targets.standard_normal(3)
    x = jnp.array([1.0, -2.0, 0.5])
    expected = -0.5 * float(jnp.sum(x**2))
    # up to an additive constant: compare differences
    d = float(t.logdensity_fn(x) - t.logdensity_fn(jnp.zeros(3)))
    np.testing.assert_allclose(d, expected, rtol=1e-6)


def test_ill_conditioned_gaussian_condition_number():
    t = targets.ill_conditioned_gaussian(8, condition_number=100.0)
    # the Hessian of -logdensity has condition number ~100
    H = -jax.hessian(t.logdensity_fn)(jnp.zeros(8))
    eig = np.linalg.eigvalsh(np.asarray(H))
    np.testing.assert_allclose(eig.max() / eig.min(), 100.0, rtol=0.01)


def test_logistic_regression_target(rng_key):
    t, X, y = targets.logistic_regression(num_points=64, dim=5)
    w = 0.1 * jax.random.normal(rng_key, (5,))
    assert np.isfinite(float(t.logdensity_fn(w)))
    # gradient at the optimum of the quadratic prior points along the data
    g = jax.grad(t.logdensity_fn)(jnp.zeros(5))
    assert np.isfinite(np.asarray(g)).all()
    assert X.shape == (64, 5) and y.shape == (64,)
