"""VI unit breadth: state/shape contracts, closed-form log-densities,
objective semantics, SVGD kernel mechanics, and pathfinder surface checks.

Scenario parity targets in the reference suite:
``tests/vi/test_meanfield_vi.py``, ``test_fullrank_vi.py``,
``test_svgd.py``, ``test_pathfinder.py``.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.scipy import stats

import blackjax_tpu
from blackjax_tpu.vi import fullrank_vi, meanfield_vi, pathfinder, svgd
from blackjax_tpu.vi._gaussian_vi import KL, RenyiAlpha, _loss_from_log_ratio

# exactness pins run in both precision passes: full precision under x64,
# f32 rounding (~1e-7 relative) otherwise
import jax as _jax
_X64 = _jax.config.jax_enable_x64
RTOL_EXACT = 1e-10 if _X64 else 5e-6


_LOGDENSITY = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)


# ---------------------------------------------------------------------------
# mean-field: init/step/sample contracts
# ---------------------------------------------------------------------------


def test_mfvi_init_zeros_mean_rho_minus_two():
    opt = optax.sgd(1e-2)
    state = meanfield_vi.init(jnp.ones(3), opt)
    np.testing.assert_allclose(np.asarray(state.mu), np.zeros(3))
    np.testing.assert_allclose(np.asarray(state.rho), -2.0 * np.ones(3))


def test_mfvi_init_pytree_position():
    state = meanfield_vi.init({"a": jnp.ones(2), "b": jnp.zeros(())}, optax.sgd(1e-2))
    assert set(state.mu) == {"a", "b"}
    assert state.rho["a"].shape == (2,)
    np.testing.assert_allclose(np.asarray(state.rho["b"]), -2.0)


def test_mfvi_step_returns_state_and_info_shapes_unchanged(rng_key):
    opt = optax.sgd(1e-2)
    state = meanfield_vi.init(jnp.ones(3), opt)
    new_state, info = meanfield_vi.step(rng_key, state, _LOGDENSITY, opt, 10)
    assert isinstance(new_state, meanfield_vi.MFVIState)
    assert new_state.mu.shape == (3,)
    assert new_state.rho.shape == (3,)
    assert jnp.ndim(info.elbo) == 0 and np.isfinite(float(info.elbo))


def test_mfvi_sample_shapes(rng_key):
    state = meanfield_vi.init(jnp.ones(3), optax.sgd(1e-2))
    draws = meanfield_vi.sample(rng_key, state, 7)
    assert draws.shape == (7, 3)
    tree_state = meanfield_vi.init({"a": jnp.ones(2), "b": jnp.zeros(())}, optax.sgd(1e-2))
    tree_draws = meanfield_vi.sample(rng_key, tree_state, 5)
    assert tree_draws["a"].shape == (5, 2)
    assert tree_draws["b"].shape == (5,)


def test_mfvi_logdensity_matches_scipy():
    mu = jnp.array([1.0, -2.0])
    rho = jnp.array([0.3, -0.7])
    logq = meanfield_vi.generate_meanfield_logdensity(mu, rho)
    x = jnp.array([0.5, 0.5])
    expected = float(jnp.sum(stats.norm.logpdf(x, mu, jnp.exp(rho))))
    np.testing.assert_allclose(float(logq(x)), expected, rtol=RTOL_EXACT)


def test_mfvi_jit_compatible(rng_key):
    opt = optax.sgd(1e-2)
    algo = blackjax_tpu.meanfield_vi(_LOGDENSITY, opt, num_samples=10)
    state = algo.init(jnp.ones(3))
    new_state, info = jax.jit(algo.step)(rng_key, state)
    assert np.isfinite(float(info.elbo))


# ---------------------------------------------------------------------------
# objectives (shared engine)
# ---------------------------------------------------------------------------


def test_renyi_alpha_one_equals_kl():
    log_ratio = jnp.array([0.2, -0.5, 1.3, 0.0])
    np.testing.assert_allclose(
        float(_loss_from_log_ratio(log_ratio, RenyiAlpha(1.0))),
        float(_loss_from_log_ratio(log_ratio, KL())),
        rtol=1e-12,
    )


def test_renyi_alpha_limits_order():
    """Rényi bounds are monotone in alpha: for a non-degenerate log-ratio
    sample, alpha=2 >= alpha=1 (KL) >= alpha=0.5."""
    log_ratio = jnp.array([0.2, -0.5, 1.3, 0.0])
    l_half = float(_loss_from_log_ratio(log_ratio, RenyiAlpha(0.5)))
    l_one = float(_loss_from_log_ratio(log_ratio, RenyiAlpha(1.0)))
    l_two = float(_loss_from_log_ratio(log_ratio, RenyiAlpha(2.0)))
    assert l_half < l_one < l_two


def test_renyi_with_stl_raises(rng_key):
    opt = optax.sgd(1e-2)
    state = meanfield_vi.init(jnp.ones(2), opt)
    with pytest.raises(ValueError, match="stl_estimator"):
        meanfield_vi.step(
            rng_key, state, _LOGDENSITY, opt, 5,
            objective=RenyiAlpha(0.5), stl_estimator=True,
        )


def test_invalid_objective_raises(rng_key):
    opt = optax.sgd(1e-2)
    state = meanfield_vi.init(jnp.ones(2), opt)
    with pytest.raises(TypeError, match="objective"):
        meanfield_vi.step(
            rng_key, state, _LOGDENSITY, opt, 5,
            objective="not-an-objective", stl_estimator=False,
        )


# ---------------------------------------------------------------------------
# full-rank: Cholesky parameterization contracts
# ---------------------------------------------------------------------------


def test_frvi_init_chol_params_shape():
    state = fullrank_vi.init(jnp.ones(4), optax.sgd(1e-2))
    assert state.chol_params.shape == (4 * 5 // 2,)
    np.testing.assert_allclose(np.asarray(state.mu), np.zeros(4))


def test_frvi_init_pytree_position():
    state = fullrank_vi.init({"a": jnp.ones(2), "b": jnp.zeros(())}, optax.sgd(1e-2))
    assert state.chol_params.shape == (3 * 4 // 2,)


def test_frvi_unflatten_cholesky_structure():
    dim = 3
    params = jnp.arange(1.0, 7.0)  # 3 log-diag + 3 strict lower
    L = fullrank_vi._unflatten_cholesky(params, dim)
    assert L.shape == (3, 3)
    # upper triangle strictly zero, diagonal exp-positive
    np.testing.assert_allclose(np.asarray(L)[np.triu_indices(3, 1)], 0.0)
    np.testing.assert_allclose(np.diag(L), np.exp([1.0, 2.0, 3.0]), rtol=RTOL_EXACT)
    np.testing.assert_allclose(
        np.asarray(L)[np.tril_indices(3, -1)], [4.0, 5.0, 6.0], rtol=1e-12
    )


def test_frvi_logdensity_matches_multivariate_normal():
    dim = 3
    params = jnp.array([0.1, -0.2, 0.3, 0.5, -0.4, 0.2])
    mu = jnp.array([1.0, 0.0, -1.0])
    L = fullrank_vi._unflatten_cholesky(params, dim)
    cov = L @ L.T
    logq = fullrank_vi.generate_fullrank_logdensity(mu, params)
    x = jnp.array([0.3, -0.6, 0.9])
    expected = float(stats.multivariate_normal.logpdf(x, mu, cov))
    np.testing.assert_allclose(float(logq(x)), expected, rtol=1e-8)


def test_frvi_sample_covariance_matches_factor(rng_key):
    dim = 2
    params = jnp.array([0.2, -0.3, 0.8])
    mu = jnp.zeros(dim)
    L = fullrank_vi._unflatten_cholesky(params, dim)
    draws = fullrank_vi._sample(rng_key, mu, params, 40000)
    emp_cov = np.cov(np.asarray(draws), rowvar=False)
    np.testing.assert_allclose(emp_cov, np.asarray(L @ L.T), atol=0.05)


def test_frvi_step_and_jit(rng_key):
    opt = optax.adam(1e-2)
    algo = blackjax_tpu.fullrank_vi(_LOGDENSITY, opt, num_samples=10)
    state = algo.init(jnp.ones(3))
    new_state, info = jax.jit(algo.step)(rng_key, state)
    assert new_state.chol_params.shape == state.chol_params.shape
    assert np.isfinite(float(info.elbo))
    draws = algo.sample(rng_key, new_state, 6)
    assert draws.shape == (6, 3)


# ---------------------------------------------------------------------------
# SVGD kernel mechanics
# ---------------------------------------------------------------------------


def test_rbf_kernel_basic_properties():
    x, y = jnp.array([0.0, 1.0]), jnp.array([1.0, 0.0])
    k = svgd.rbf_kernel(x, y, length_scale=1.0)
    assert 0.0 < float(k) <= 1.0
    np.testing.assert_allclose(float(svgd.rbf_kernel(x, x)), 1.0, rtol=1e-12)
    np.testing.assert_allclose(
        float(svgd.rbf_kernel(x, y)), float(svgd.rbf_kernel(y, x)), rtol=1e-12
    )
    # larger bandwidth -> higher value for distinct points
    assert float(svgd.rbf_kernel(x, y, length_scale=10.0)) > float(
        svgd.rbf_kernel(x, y, length_scale=1.0)
    )


def test_rbf_kernel_pytree():
    x = {"a": jnp.zeros(2), "b": jnp.zeros(())}
    y = {"a": jnp.ones(2), "b": jnp.ones(())}
    expected = np.exp(-3.0)  # squared distance 2 + 1
    np.testing.assert_allclose(float(svgd.rbf_kernel(x, y)), expected, rtol=RTOL_EXACT)


def test_median_heuristic_exact_small_set():
    particles = jnp.array([[0.0], [1.0], [3.0]])
    # pairwise distances {1, 2, 3}: median 2 -> length_scale 4/log(3)
    params = svgd.median_heuristic({"length_scale": 1.0}, particles)
    np.testing.assert_allclose(
        float(params["length_scale"]), 4.0 / np.log(3.0), rtol=RTOL_EXACT
    )


def test_svgd_step_moves_particles_toward_mode(rng_key):
    grad_fn = jax.grad(lambda x: -0.5 * jnp.sum((x - 2.0) ** 2))
    opt = optax.sgd(0.1)
    particles = jax.random.normal(rng_key, (30, 2)) - 3.0
    state = svgd.init(particles, {"length_scale": 1.0}, opt)
    kernel = svgd.build_kernel(opt)
    new_state = kernel(state, grad_fn, svgd.rbf_kernel)
    assert new_state.particles.shape == (30, 2)
    assert not np.allclose(np.asarray(new_state.particles), np.asarray(particles))
    # mean moves toward the mode at 2
    assert float(jnp.mean(new_state.particles)) > float(jnp.mean(particles))


def test_svgd_update_median_heuristic_and_jit(rng_key):
    grad_fn = jax.grad(lambda x: -0.5 * jnp.sum(x**2))
    opt = optax.sgd(0.05)
    algo = blackjax_tpu.svgd(grad_fn, opt)
    state = algo.init(jax.random.normal(rng_key, (20, 2)))
    state = jax.jit(algo.step)(state)
    assert isinstance(state, svgd.SVGDState)
    updated = svgd.update_median_heuristic({"length_scale": 0.0}, state.particles)
    assert float(updated["length_scale"]) > 0.0


# ---------------------------------------------------------------------------
# pathfinder surface
# ---------------------------------------------------------------------------


def _quadratic_logdensity(x):
    return -0.5 * jnp.sum((x - jnp.array([1.0, -1.0])) ** 2 / jnp.array([1.0, 4.0]))


def test_pathfinder_state_and_mode(rng_key):
    state, info = pathfinder.approximate(
        rng_key, _quadratic_logdensity, jnp.zeros(2) + 3.0
    )
    assert np.isfinite(float(state.elbo))
    assert state.position.shape == (2,)
    np.testing.assert_allclose(np.asarray(state.position), [1.0, -1.0], atol=0.3)
    # the path carries one candidate per L-BFGS iterate
    assert info.path.elbo.ndim == 1
    assert info.path.position.shape[0] == info.path.elbo.shape[0]


def test_pathfinder_sample_shapes_and_logq(rng_key):
    state, _ = pathfinder.approximate(rng_key, _quadratic_logdensity, 3.0 + jnp.zeros(2))
    draws, logq = pathfinder.sample(rng_key, state, (50,))
    assert draws.shape == (50, 2)
    assert logq.shape == (50,)
    assert np.isfinite(np.asarray(logq)).all()
    assert np.isfinite(np.asarray(draws)).all()
    # single-draw path returns an unbatched position
    single, logq1 = pathfinder.sample(rng_key, state)
    assert single.shape == (2,)


def test_pathfinder_pytree_position(rng_key):
    logdensity = lambda p: -0.5 * (
        jnp.sum(p["a"] ** 2) + (p["b"] - 2.0) ** 2
    )
    init_pos = {"a": jnp.ones(2), "b": jnp.zeros(())}
    state, _ = pathfinder.approximate(rng_key, logdensity, init_pos)
    assert set(state.position) == {"a", "b"}
    np.testing.assert_allclose(float(state.position["b"]), 2.0, atol=0.3)
    draws, _ = pathfinder.sample(rng_key, state, (9,))
    assert draws["a"].shape == (9, 2)
    assert draws["b"].shape == (9,)


def test_pathfinder_top_level_step_is_noop(rng_key):
    algo = blackjax_tpu.pathfinder(_quadratic_logdensity)
    state, _ = algo.init(rng_key, jnp.zeros(2))
    same_state, info = algo.step(rng_key, state)
    np.testing.assert_allclose(
        np.asarray(same_state.position), np.asarray(state.position)
    )
