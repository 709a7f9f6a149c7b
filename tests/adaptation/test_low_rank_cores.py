"""Low-rank metric-core contracts: buffer mechanics, finalization
invariants, gradient seeding, and conditioning payoffs.

Scenario parity target: the reference's
``tests/adaptation/test_low_rank_recipes.py`` (core contract classes,
SeedLowRankSigmaFromGrad, EstimatorCorrectnessInvariant, registry
option requirements).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.metric_recipes import (
    REGISTRY,
    LowRankMetricCoreState,
    lookup_recipe,
    seed_low_rank_sigma_from_grad,
)
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix

D, BUF = 6, 32


def _spiked_cov(d=D, spike=25.0):
    v = jnp.ones(d) / jnp.sqrt(d)
    return jnp.eye(d) + spike * jnp.outer(v, v), v


def _draws_grads(key, cov, n):
    chol = jnp.linalg.cholesky(cov)
    prec = jnp.linalg.inv(cov)
    draws = jax.random.normal(key, (n, cov.shape[0])) @ chol.T
    return draws, -draws @ prec.T


@pytest.fixture(params=["fisher_low_rank", "sample_cov_low_rank"])
def core_name(request):
    return request.param


def _build(name):
    return lookup_recipe(name).build_core(buffer_size=BUF, max_rank=3)


# ---------------------------------------------------------------------------
# state and buffer mechanics
# ---------------------------------------------------------------------------


def test_init_state_fields_and_identity_metric(core_name):
    core = _build(core_name)
    state = core.init(D)
    assert isinstance(state, LowRankMetricCoreState)
    imm = state.inverse_mass_matrix
    assert isinstance(imm, LowRankInverseMassMatrix)
    np.testing.assert_allclose(np.asarray(imm.sigma), np.ones(D))
    np.testing.assert_allclose(np.asarray(imm.lam), 1.0)
    assert state.draws_buffer.shape == (BUF, D)
    assert state.grads_buffer.shape == (BUF, D)
    assert int(state.buffer_idx) == 0


def test_update_increments_and_writes_buffer(core_name, rng_key):
    core = _build(core_name)
    state = core.init(D)
    draws, grads = _draws_grads(rng_key, jnp.eye(D), 3)
    for i in range(3):
        state = core.update(state, draws[i], grads[i])
        assert int(state.buffer_idx) == i + 1
    np.testing.assert_allclose(
        np.asarray(state.draws_buffer[:3]), np.asarray(draws), rtol=1e-12
    )


def test_update_is_scannable(core_name, rng_key):
    core = _build(core_name)
    draws, grads = _draws_grads(rng_key, jnp.eye(D), 10)

    def body(state, xg):
        return core.update(state, xg[0], xg[1]), None

    scanned, _ = jax.lax.scan(body, core.init(D), (draws, grads))
    sequential = core.init(D)
    for i in range(10):
        sequential = core.update(sequential, draws[i], grads[i])
    np.testing.assert_allclose(
        np.asarray(scanned.draws_buffer), np.asarray(sequential.draws_buffer)
    )
    assert int(scanned.buffer_idx) == int(sequential.buffer_idx)


def test_final_produces_finite_metric_of_correct_shape(core_name, rng_key):
    core = _build(core_name)
    cov, _ = _spiked_cov()
    draws, grads = _draws_grads(rng_key, cov, BUF)
    state = core.init(D)
    for i in range(BUF):
        state = core.update(state, draws[i], grads[i])
    state = core.final(state)
    imm = state.inverse_mass_matrix
    assert imm.sigma.shape == (D,)
    assert imm.U.shape[0] == D
    assert np.isfinite(np.asarray(imm.sigma)).all()
    assert np.isfinite(np.asarray(imm.lam)).all()
    assert (np.asarray(imm.sigma) > 0).all()


def test_sample_cov_core_ignores_gradients(rng_key):
    """The draws-only core must produce the same metric whatever the grads
    fed to it."""
    core = _build("sample_cov_low_rank")
    cov, _ = _spiked_cov()
    draws, grads = _draws_grads(rng_key, cov, BUF)
    fake_grads = 1e6 * jax.random.normal(jax.random.fold_in(rng_key, 9), (BUF, D))

    def run(gs):
        state = core.init(D)
        for i in range(BUF):
            state = core.update(state, draws[i], gs[i])
        return core.final(state).inverse_mass_matrix

    a, b = run(grads), run(fake_grads)
    np.testing.assert_allclose(np.asarray(a.sigma), np.asarray(b.sigma), rtol=1e-10)
    np.testing.assert_allclose(np.asarray(a.lam), np.asarray(b.lam), rtol=1e-10)


# ---------------------------------------------------------------------------
# gradient seeding
# ---------------------------------------------------------------------------


def test_seed_sigma_from_grad_magnitude():
    core = _build("fisher_low_rank")
    state = core.init(D)
    grad = jnp.array([4.0, -9.0, 1.0, 0.25, 16.0, -1.0])
    seeded = seed_low_rank_sigma_from_grad(state, grad)
    np.testing.assert_allclose(
        np.asarray(seeded.inverse_mass_matrix.sigma),
        1.0 / np.sqrt(np.abs(np.asarray(grad))),
        rtol=1e-12,
    )
    # U, lam and mu_star untouched
    np.testing.assert_allclose(
        np.asarray(seeded.inverse_mass_matrix.lam),
        np.asarray(state.inverse_mass_matrix.lam),
    )
    np.testing.assert_allclose(np.asarray(seeded.mu_star), np.asarray(state.mu_star))


def test_seed_sigma_near_zero_grad_is_clipped_finite():
    core = _build("fisher_low_rank")
    state = core.init(D)
    seeded = seed_low_rank_sigma_from_grad(state, jnp.zeros(D))
    sigma = np.asarray(seeded.inverse_mass_matrix.sigma)
    assert np.isfinite(sigma).all()
    assert (sigma > 0).all()


# ---------------------------------------------------------------------------
# estimator payoff: conditioning
# ---------------------------------------------------------------------------


def _condition_number_through_metric(imm, cov):
    """Condition number of the preconditioned target: L^T Sigma^-1 L where
    IMM = L L^T (evaluated densely for the test)."""
    d = cov.shape[0]
    dense_imm = np.diag(np.asarray(imm.sigma) ** 2)
    U = np.asarray(imm.U)
    lam = np.atleast_1d(np.asarray(imm.lam))
    if U.ndim == 2 and U.shape[1] > 0:
        sig = np.asarray(imm.sigma)
        dense_imm = dense_imm + (sig[:, None] * U) @ np.diag(lam - 1.0) @ (
            sig[:, None] * U
        ).T
    L = np.linalg.cholesky(dense_imm)
    m = L.T @ np.linalg.inv(np.asarray(cov)) @ L
    evals = np.linalg.eigvalsh(m)
    return evals.max() / evals.min()


@pytest.mark.parametrize("name", ["fisher_low_rank", "sample_cov_low_rank"])
def test_low_rank_metric_reduces_condition_number(name, rng_key):
    # the draws-only estimator needs a larger window before the spike
    # estimate stabilizes (at n=32 shrinkage only halves the spike)
    n = 256
    core = lookup_recipe(name).build_core(buffer_size=n, max_rank=3)
    cov, _ = _spiked_cov(spike=40.0)
    draws, grads = _draws_grads(rng_key, cov, n)
    state = core.init(D)
    for i in range(n):
        state = core.update(state, draws[i], grads[i])
    before = _condition_number_through_metric(state.inverse_mass_matrix, cov)
    state = core.final(state)
    after = _condition_number_through_metric(state.inverse_mass_matrix, cov)
    assert after < before / 3.0  # the 41x spike must be mostly flattened


# ---------------------------------------------------------------------------
# registry option requirements
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name", ["fisher_low_rank", "sample_cov_low_rank"])
def test_build_core_requires_buffer_size(name):
    with pytest.raises(TypeError, match="buffer_size"):
        REGISTRY[name].build_core()


def test_low_rank_recipes_declare_low_rank_emission():
    for name in ("fisher_low_rank", "fisher_low_rank_accumulating",
                 "sample_cov_low_rank", "draws_svd_low_rank"):
        assert REGISTRY[name].emits == "low_rank", name
