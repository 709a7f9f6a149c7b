"""Depth tier for the adaptive-tempering ESS machinery.

Scenario-class parity target: ``tests/smc/test_smc_ess.py`` in the
reference (solver-hits-target grid over target ESS x particle structure,
the asymmetric-loglikelihood boundary regression for the issue-914 sign
bug class) plus the ``map_fn``/``map_kernel`` memory-capped batching
contracts from ``tests/smc/test_smc.py``. The test bodies are our own:
closed-form scale invariance and diagonal-metric ESJD pins instead of the
reference's spellings.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.smc import solver
from blackjax_tpu.smc.base import map_fn, map_kernel
from blackjax_tpu.smc.ess import ess, ess_solver
from blackjax_tpu.smc.pretuning import esjd


def _solve(loglik_fn, particles, target, max_delta=10.0):
    return ess_solver(loglik_fn, particles, target, max_delta, solver.dichotomy)


@pytest.mark.parametrize("target_ess", [0.25, 0.5, 0.9])
@pytest.mark.parametrize("structure", ["univariate", "multivariate", "pytree"])
def test_solver_hits_target_ess(target_ess, structure, rng_key):
    """The returned increment must achieve the target ESS under the SAME
    weight expression the tempered kernel applies (``delta * loglik``)."""
    n = 1000
    k1, k2 = jax.random.split(rng_key)
    if structure == "univariate":
        particles = jax.random.normal(k1, (n,))
        loglik_fn = lambda x: -0.5 * (x / 0.1) ** 2
    elif structure == "multivariate":
        particles = jax.random.normal(k1, (n, 3))
        loglik_fn = lambda x: -0.5 * jnp.sum((x / 0.2) ** 2, axis=-1)
    else:  # pytree: dict of two differently-shaped leaves
        particles = {
            "a": jax.random.normal(k1, (n,)),
            "b": jax.random.normal(k2, (n, 2)),
        }
        loglik_fn = lambda p: -0.5 * (
            (p["a"] / 0.3) ** 2 + jnp.sum((p["b"] / 0.3) ** 2, axis=-1)
        )

    delta = _solve(loglik_fn, particles, target_ess)
    assert float(delta) > 0.0
    achieved = float(ess(delta * loglik_fn(particles)))
    np.testing.assert_allclose(achieved, target_ess * n, rtol=2e-2)


def test_solver_boundary_asymmetric_loglikelihood(rng_key):
    """Sign-bug regression class: heavy-tailed prior particles and a
    concentrated off-centre likelihood whose one-step IS reweighting
    already exceeds the target ESS. The bisection must then return
    ``max_delta`` exactly (no tempering needed) — a flipped sign inside
    the solver collapses the increment to ~0 and stalls the schedule."""
    n = 4096
    # heavy-tailed (student-t, 2 dof) prior draws
    z = jax.random.normal(rng_key, (n,))
    chi = jax.random.chisquare(jax.random.fold_in(rng_key, 1), 2.0, (n,))
    particles = z / jnp.sqrt(chi / 2.0)
    loglik_fn = lambda x: -0.5 * ((x - 1.5) / 0.4) ** 2

    # premise: prior-IS ESS at delta=1 already above target
    target = 0.5 * float(ess(loglik_fn(particles))) / n
    delta = _solve(loglik_fn, particles, target, max_delta=1.0)
    np.testing.assert_allclose(float(delta), 1.0, atol=1e-6)


def test_solver_scale_invariance(rng_key):
    """ESS depends on loglik only through ``delta * loglik``, so scaling
    the log-likelihood by k must scale the interior solution by 1/k."""
    n = 800
    particles = jax.random.normal(rng_key, (n,))
    base = lambda x: -0.5 * (x / 0.15) ** 2
    d1 = _solve(base, particles, 0.4)
    d3 = _solve(lambda x: 3.0 * base(x), particles, 0.4)
    np.testing.assert_allclose(float(d3), float(d1) / 3.0, rtol=1e-3)


def test_solver_unreachable_target_is_nan(rng_key):
    """target ESS above N is unreachable at any delta >= 0: the objective
    is negative on the whole interval and the NaN sentinel comes back."""
    particles = jax.random.normal(rng_key, (100,))
    delta = _solve(lambda x: -0.5 * x**2, particles, 1.1)
    assert np.isnan(float(delta))


def test_solver_jit_and_grad_safe(rng_key):
    """The solver runs inside the jitted tempering step; it must compile
    and produce the same increment as the eager call."""
    particles = jax.random.normal(rng_key, (500,))
    loglik_fn = lambda x: -0.5 * (x / 0.2) ** 2
    eager = _solve(loglik_fn, particles, 0.6)
    jitted = jax.jit(lambda p: _solve(loglik_fn, p, 0.6))(particles)
    np.testing.assert_allclose(float(jitted), float(eager), rtol=1e-12)


# ---------------------------------------------------------------------------
# memory-capped batching (map_fn / map_kernel)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("batch_size", [1, 3, 4, 7, 10])
def test_map_fn_matches_vmap_for_any_batch_size(batch_size, rng_key):
    """``lax.map(..., batch_size=b)`` must agree with vmap bit-for-bit on
    elementwise work for every batch size, including non-divisors of N
    (the remainder chunk), and to reduction-order tolerance on dots."""
    xs = jax.random.normal(rng_key, (10, 4))
    elementwise = lambda x: jnp.tanh(x) * 2.0 + 1.0
    np.testing.assert_array_equal(
        np.asarray(map_fn(elementwise, batch_size)(xs)),
        np.asarray(jax.vmap(elementwise)(xs)),
    )
    # a contraction may re-associate between the mapped and vmapped
    # schedules; agreement must still be ULP-grade
    dot = lambda x: jnp.tanh(x) @ jnp.arange(4.0)
    rtol = 20 * float(jnp.finfo(xs.dtype).eps)
    np.testing.assert_allclose(
        np.asarray(map_fn(dot, batch_size)(xs)),
        np.asarray(jax.vmap(dot)(xs)),
        rtol=rtol,
        atol=rtol,
    )


def test_map_kernel_non_divisor_batch(rng_key):
    """The kernel variant threads (key, state, *params) tuples through the
    same capped map; a non-divisor batch size must not drop or duplicate
    particles."""
    n = 11
    keys = jax.random.split(rng_key, n)
    states = jnp.arange(float(n))
    kernel = lambda key, state, scale: state + scale * jax.random.normal(key)
    capped = map_kernel(kernel, batch_size=4)(keys, states, jnp.full(n, 0.1))
    full = jax.vmap(kernel)(keys, states, jnp.full(n, 0.1))
    np.testing.assert_array_equal(np.asarray(capped), np.asarray(full))


def test_map_fn_zero_is_plain_vmap(rng_key):
    xs = jax.random.normal(rng_key, (6, 2))
    fn = lambda x: jnp.sum(x**2)
    np.testing.assert_array_equal(
        np.asarray(map_fn(fn, 0)(xs)), np.asarray(jax.vmap(fn)(xs))
    )


# ---------------------------------------------------------------------------
# ESJD chain-mixing measure
# ---------------------------------------------------------------------------


def test_esjd_diagonal_metric_closed_form():
    """With a diagonal metric the Mahalanobis ESJD has an unambiguous
    closed form: acceptance * sum_i m_ii * jump_i^2."""
    m = jnp.diag(jnp.array([4.0, 1.0, 0.25]))
    prev = jnp.array([[0.0, 0.0, 0.0], [1.0, 2.0, 3.0]])
    nxt = jnp.array([[1.0, -1.0, 2.0], [1.0, 2.0, 3.0]])
    acc = jnp.array([0.5, 0.9])
    got = esjd(m)(prev, nxt, acc)
    expected = acc * jnp.array([4.0 * 1 + 1.0 * 1 + 0.25 * 4, 0.0])
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=1e-6)


def test_esjd_zero_acceptance_kills_the_jump():
    m = jnp.eye(2)
    prev = jnp.ones((3, 2))
    nxt = jnp.zeros((3, 2))
    got = esjd(m)(prev, nxt, jnp.zeros(3))
    np.testing.assert_array_equal(np.asarray(got), np.zeros(3))
