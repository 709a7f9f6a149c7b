"""Metric stack tests: CGL moment buffers, low-rank Fisher estimators,
recipe registry, and the low-rank window adaptation driver.

Parity model: ``blackjax/tests/adaptation/test_metric_*.py`` and
``test_low_rank_adaptation.py`` (estimator recovery on planted anisotropic
Gaussians, schedule structure, end-to-end warmup quality).
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation import metric_buffers as mb


from blackjax_tpu.adaptation import metric_estimators as me
from blackjax_tpu.adaptation.low_rank_adaptation import (
    _accumulating_buffer_capacity,
    build_growing_window_schedule,
    window_adaptation_low_rank,
)
from blackjax_tpu.adaptation.metric_recipes import REGISTRY, lookup_recipe
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix, default_metric

TIGHT = 1e-10 if jax.config.jax_enable_x64 else 1e-5


# ---------------------------------------------------------------------------
# Buffers
# ---------------------------------------------------------------------------


def test_cgl_merge_matches_numpy_dense():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(40, 3))
    block = mb.MomentBlock(jnp.zeros(()), jnp.zeros(3), jnp.zeros((3, 3)))
    # fold in uneven batches
    for chunk in np.split(xs, [7, 19, 26]):
        block = mb.cgl_update_batch(block, jnp.asarray(chunk))
    assert int(block.count) == 40
    np.testing.assert_allclose(np.asarray(block.mean), xs.mean(0), rtol=TIGHT)
    cov = np.asarray(block.m2) / 39
    np.testing.assert_allclose(cov, np.cov(xs.T), rtol=TIGHT * 10)


def test_cgl_merge_two_absorbs_empty():
    blk = mb.MomentBlock(jnp.asarray(5.0), jnp.ones(2), jnp.ones(2) * 3)
    empty = mb.MomentBlock(jnp.zeros(()), jnp.zeros(2), jnp.zeros(2))
    merged = mb.cgl_merge_two(empty, blk)
    np.testing.assert_allclose(np.asarray(merged.mean), np.ones(2))
    np.testing.assert_allclose(np.asarray(merged.m2), np.ones(2) * 3)


def test_ring_buffer_pops_oldest_split():
    rng = np.random.default_rng(1)
    old = rng.normal(size=(30, 2)) * 10.0  # to be forgotten
    recent = rng.normal(size=(60, 2))
    buf = mb.accumulating_split_pop_buffer(2, k=2, diagonal=True)
    state = buf.init()
    state = buf.update(state, jnp.asarray(old))
    state = buf.push_split(state)
    state = buf.update(state, jnp.asarray(recent[:30]))
    state = buf.push_split(state)  # wraps: pops `old`
    state = buf.update(state, jnp.asarray(recent[30:]))
    block = buf.get_moments(state)
    assert int(block.count) == 60
    np.testing.assert_allclose(
        np.asarray(block.m2) / 59, recent.var(0, ddof=1), rtol=TIGHT * 100
    )


def test_late_start_skips_transient():
    buf = mb.late_start(mb.reset_window_buffer(2, diagonal=True), offset_steps=3)
    state = buf.init()
    for i in range(5):
        state = buf.update(state, jnp.full((1, 2), float(i)))
    block = buf.get_moments(state)
    assert int(block.count) == 2  # only draws 3 and 4 counted
    np.testing.assert_allclose(np.asarray(block.mean), [3.5, 3.5])


def test_ensemble_batch_buffer_shape_guard():
    buf = mb.ensemble_batch_buffer(3, n_chains=4, diagonal=True)
    state = buf.init()
    state = buf.update(state, jnp.ones((4, 3)))
    with pytest.raises(ValueError, match="partial batches"):
        buf.update(state, jnp.ones((2, 3)))


# ---------------------------------------------------------------------------
# Estimators
# ---------------------------------------------------------------------------


def _gaussian_draws_and_grads(key, cov, n):
    d = cov.shape[0]
    chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, (n, d))
    draws = z @ chol.T
    prec = jnp.linalg.inv(cov)
    grads = -draws @ prec.T
    return draws, grads


def test_fisher_low_rank_recovers_planted_structure():
    """Anisotropic Gaussian with one dominant direction: sigma*(I+U(Λ-I)Uᵀ)*sigma
    must approximate the true covariance (the correct IMM for a Gaussian)."""
    d, n, rank = 8, 600, 3
    key = jax.random.key(2)
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v, v)  # eigenvalue 25 along v
    draws, grads = _gaussian_draws_and_grads(key, cov, n)

    sigma, mu_star, U, lam = me._compute_low_rank_metric(
        draws, grads, jnp.asarray(n), rank, 1e-5, 2.0
    )
    # reconstruct M^{-1} = D (I + U(Λ-1)Uᵀ) D
    inner = jnp.eye(d) + (U * (lam - 1.0)) @ U.T
    m_inv = sigma[:, None] * inner * sigma[None, :]
    # dominant eigenvector/eigenvalue recovered
    w, V = jnp.linalg.eigh(m_inv)
    np.testing.assert_allclose(float(w[-1]), 25.0, rtol=0.35)
    assert abs(float(V[:, -1] @ v)) > 0.98
    # mu* near the true mean (0)
    assert float(jnp.linalg.norm(mu_star)) < 1.5


def test_fisher_diagonal_exact_on_gaussian():
    """For N(0, D) the Fisher diagonal sqrt(Var[x]/Var[g]) equals D exactly
    in expectation."""
    d, n = 5, 4000
    scales = jnp.asarray([0.1, 0.5, 1.0, 3.0, 10.0])
    cov = jnp.diag(scales**2)
    draws, grads = _gaussian_draws_and_grads(jax.random.key(3), cov, n)
    imm = me.fisher_score_diagonal(draws, grads)
    np.testing.assert_allclose(np.asarray(imm), np.asarray(scales**2), rtol=0.15)


def _reconstruct_m_inv(sigma, U, lam):
    d = sigma.shape[0]
    inner = jnp.eye(d) + (U * (lam - 1.0)) @ U.T
    return sigma[:, None] * inner * sigma[None, :]


@pytest.mark.x64only  # the fisher low-rank pipeline is documented
# f32-fragile; with x64 globally disabled the internal promotion is a no-op
def test_low_rank_metric_respects_mask():
    """Rows past n must not influence the estimated operator. (Compare the
    reconstructed M^{-1}, not raw factors — eigenvector sign/order is free.)"""
    d, n = 4, 64
    v = jnp.ones(d) / 2.0
    cov = jnp.eye(d) + 15.0 * jnp.outer(v, v)
    draws, grads = _gaussian_draws_and_grads(jax.random.key(4), cov, n)
    sigma_f, mu_f, U_f, lam_f = me._compute_low_rank_metric(
        draws, grads, jnp.asarray(n), 2, 1e-5, 2.0
    )
    poisoned_draws = jnp.concatenate([draws, jnp.full((16, d), 1e6)])
    poisoned_grads = jnp.concatenate([grads, jnp.full((16, d), -1e6)])
    sigma_m, mu_m, U_m, lam_m = me._compute_low_rank_metric(
        poisoned_draws, poisoned_grads, jnp.asarray(n), 2, 1e-5, 2.0
    )
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma_m), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_m), rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(_reconstruct_m_inv(sigma_f, U_f, lam_f)),
        np.asarray(_reconstruct_m_inv(sigma_m, U_m, lam_m)),
        rtol=1e-6,
        atol=1e-8,
    )


def test_eigenvalue_informativeness_selection():
    lam = jnp.asarray([25.0, 1.05, 0.9, 0.01])
    U = jnp.eye(4)
    U_sel, lam_sel = me.select_top_eigenvalues_by_informativeness(
        lam, U, max_rank=4, cutoff=2.0
    )
    kept = np.sort(np.asarray(lam_sel)[np.asarray(lam_sel) != 1.0])
    # cutoff 2 keeps only eigenvalues outside [1/2, 2]
    np.testing.assert_allclose(kept, [0.01, 25.0], rtol=1e-5)


# ---------------------------------------------------------------------------
# Recipes / registry
# ---------------------------------------------------------------------------


def test_registry_names_and_validation():
    assert set(REGISTRY) == {
        "welford_diag",
        "welford_dense",
        "fisher_diag",
        "fisher_low_rank",
        "fisher_low_rank_accumulating",
        "sample_cov_low_rank",
        "draws_svd_low_rank",
    }
    with pytest.raises(ValueError, match="Unknown metric recipe"):
        lookup_recipe("nope")


# ---------------------------------------------------------------------------
# Raw-draw ring (requires_draws path)
# ---------------------------------------------------------------------------


def test_raw_draw_ring_moments_and_wraparound(rng_key):
    """Partially filled: moments over valid rows only. Overfilled: the last
    ``capacity`` rows win (row-granular forgetting)."""
    tight = 1e-12 if jax.config.jax_enable_x64 else 1e-5
    d, capacity = 3, 8
    ring = mb.raw_draw_ring_buffer(d, capacity)
    draws = jax.random.normal(rng_key, (14, d)) + jnp.arange(14)[:, None]

    state = ring.init()
    state = ring.update(state, draws[:5])
    block = ring.get_moments(state)
    assert float(block.count) == 5
    np.testing.assert_allclose(
        np.asarray(block.mean), np.asarray(draws[:5]).mean(0), rtol=tight
    )
    n_valid, _ = ring.get_support(state)
    assert float(n_valid) == 5

    for i in range(5, 14):  # wrap: 14 rows through an 8-slot ring
        state = ring.update(state, draws[i])
    block = ring.get_moments(state)
    assert float(block.count) == capacity
    expected = np.asarray(draws[-capacity:])
    np.testing.assert_allclose(np.asarray(block.mean), expected.mean(0), rtol=tight)
    centered = expected - expected.mean(0)
    np.testing.assert_allclose(np.asarray(block.m2), centered.T @ centered, rtol=tight * 100)
    # splits don't forget rows
    assert float(ring.get_moments(ring.push_split(state)).count) == capacity


def test_requires_draws_ring_buffer_constructs():
    buf = mb.accumulating_split_pop_buffer(6, 2, requires_draws=True)
    state = buf.init()
    assert state.draws.shape[1] == 6


def test_draws_svd_masked_matches_subset(rng_key):
    """Masked SVD over a zero-padded ring equals the SVD of the valid rows."""
    d, n = 5, 12
    draws = jax.random.normal(rng_key, (n, d)) @ jnp.diag(
        jnp.array([3.0, 1.0, 1.0, 0.5, 0.2])
    )
    full = me.draws_singular_value_low_rank(draws, 2)
    padded = jnp.concatenate([draws, jnp.full((4, d), 99.0)])  # garbage rows
    mask = jnp.arange(n + 4) < n
    masked = me.draws_singular_value_low_rank(padded, 2, row_mask=mask)
    np.testing.assert_allclose(np.asarray(masked.sigma), np.asarray(full.sigma), rtol=TIGHT)
    np.testing.assert_allclose(np.asarray(masked.lam), np.asarray(full.lam), rtol=TIGHT * 100)
    # eigenvectors up to sign
    vec_tol = 1e-8 if jax.config.jax_enable_x64 else 1e-4
    for k in range(2):
        a, b = np.asarray(masked.U[:, k]), np.asarray(full.U[:, k])
        assert min(np.abs(a - b).max(), np.abs(a + b).max()) < vec_tol


def test_draws_svd_recipe_recovers_planted_structure(rng_key):
    """The streaming draws-SVD core recovers a planted dominant direction."""
    d = 6
    direction = jnp.ones(d) / jnp.sqrt(d)
    key_z, key_e = jax.random.split(rng_key)
    z = jax.random.normal(key_z, (64,))
    noise = 0.05 * jax.random.normal(key_e, (64, d))
    draws = 3.0 * z[:, None] * direction[None, :] + noise

    core = lookup_recipe("draws_svd_low_rank").build_core(capacity=64, max_rank=2)
    state = core.init(d)
    state = core.update(state, draws)
    state = core.final(state)
    imm = state.inverse_mass_matrix
    # in standardized coordinates the planted direction dominates; its
    # whitened image is isotropic-ish, so check the top eigenvector aligns
    top = np.asarray(imm.U[:, np.argmax(np.abs(np.asarray(imm.lam) - 1.0))])
    alignment = abs(float(top @ direction))
    assert alignment > 0.95
    assert float(jnp.max(imm.lam)) > 2.0  # the planted direction is loud


@pytest.mark.parametrize("recipe_name", ["fisher_diag", "welford_dense"])
def test_staged_adaptation_with_recipes(rng_key, recipe_name):
    """The staged engine runs with swapped-in metric recipes and yields a
    usable step size + IMM."""
    d = 4
    scales = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)
    warmup = staged_adaptation(
        blackjax_tpu.nuts, logdensity, metric=recipe_name, max_num_doublings=6
    )
    (state, params), _ = warmup.run(rng_key, jnp.ones(d), num_steps=400)
    assert 0.05 < float(params["step_size"]) < 10.0
    imm = params["inverse_mass_matrix"]
    diag = jnp.diag(imm) if imm.ndim == 2 else imm
    # variances ordered like the target scales
    assert bool(jnp.all(jnp.diff(diag) > 0))


# ---------------------------------------------------------------------------
# Schedule
# ---------------------------------------------------------------------------


def test_growing_window_schedule_structure():
    sched = np.asarray(build_growing_window_schedule(1000))
    assert sched.shape == (1000, 2)
    # final 15% is step-size-only (stage 0)
    assert (sched[850:, 0] == 0).all()
    assert (sched[:850, 0] == 1).all()
    ends = np.flatnonzero(sched[:, 1])
    # last slow step closes a window (is_late absorption)
    assert ends[-1] == 849
    window_sizes = np.diff(np.concatenate([[-1], ends]))
    # early phase: fixed size-10 windows over the first 30%
    assert (window_sizes[:30] == 10).all()
    # main phase grows ~1.5x until absorption
    main = window_sizes[30:]
    assert main[0] == 80
    assert all(b >= a for a, b in zip(main[:-2], main[1:-1]))
    assert window_sizes.sum() == 850


def test_growing_window_schedule_tiny():
    sched = np.asarray(build_growing_window_schedule(10))
    assert (sched[:, 0] == 0).all() and not sched[:, 1].any()


def test_accumulating_buffer_capacity():
    sched = jnp.asarray(
        [(1, 0), (1, 1), (1, 0), (1, 0), (1, 1), (1, 0), (1, 0), (1, 0), (1, 1)]
    )
    # windows: 2, 3, 4 -> max consecutive pair sum = 7
    assert _accumulating_buffer_capacity(sched) == 7
    assert _accumulating_buffer_capacity(jnp.asarray([(1, 0), (1, 1)])) == 2


# ---------------------------------------------------------------------------
# End-to-end low-rank window adaptation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("buffer_policy", ["reset", "accumulating"])
def test_window_adaptation_low_rank_end_to_end(rng_key, buffer_policy):
    """NUTS + nutpie warmup on a correlated Gaussian: the adapted low-rank
    metric must capture the dominant direction and post-warmup sampling must
    recover the target covariance scale."""
    d = 6
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 35.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x

    warmup_key, sample_key = jax.random.split(rng_key)
    kwargs = dict(max_rank=3, gradient_based_init=True, max_num_doublings=8)
    if buffer_policy == "accumulating":
        kwargs.update(
            schedule_fn=build_growing_window_schedule, recompute_every=10
        )
    warmup = window_adaptation_low_rank(
        blackjax_tpu.nuts, logdensity, buffer_policy=buffer_policy, **kwargs
    )
    (state, params), _ = jax.jit(
        functools.partial(warmup.run, num_steps=600)
    )(warmup_key, jnp.ones(d))

    imm = params["inverse_mass_matrix"]
    assert isinstance(imm, LowRankInverseMassMatrix)
    inner = jnp.eye(d) + (imm.U * (imm.lam - 1.0)) @ imm.U.T
    m_inv = imm.sigma[:, None] * inner * imm.sigma[None, :]
    w, V = jnp.linalg.eigh(m_inv)
    assert abs(float(V[:, -1] @ v)) > 0.95
    assert 12.0 < float(w[-1]) < 110.0  # true top eigenvalue is 36

    algo = blackjax_tpu.nuts(logdensity, **params)

    def step_fn(s, k):
        s, _ = algo.step(k, s)
        return s, s.position

    keys = jax.random.split(sample_key, 500)
    _, samples = jax.lax.scan(step_fn, state, keys)
    proj = samples @ v
    # variance along the stiff direction (36) recovered within tolerance
    assert 15.0 < float(jnp.var(proj)) < 80.0


def test_window_adaptation_low_rank_info_drops_buffers(rng_key):
    """The default info fn must not stack the O(buffer x d) working buffers
    into the per-step trace."""
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    warmup = window_adaptation_low_rank(blackjax_tpu.nuts, logdensity, max_rank=2)
    _, info = warmup.run(rng_key, jnp.zeros(3), num_steps=80)
    imm_state = info.adaptation_state.imm_state
    assert imm_state.draws_buffer is None and imm_state.grads_buffer is None
    assert imm_state.mu_star.shape == (80, 3)


def test_stan_schedule_exact_windows():
    """Stan's canonical 1000-step warmup: 75 fast, slow windows of
    25/50/100/200/500 (the last absorbs the remainder), 50 fast — with the
    middle-window-end flag on exactly the five window boundaries."""
    from blackjax_tpu.adaptation.staged_adaptation import build_schedule

    sched = np.asarray(build_schedule(1000))
    assert sched.shape == (1000, 2)
    stages, ends = sched[:, 0], sched[:, 1]
    assert (stages[:75] == 0).all()
    assert (stages[75:950] == 1).all()
    assert (stages[950:] == 0).all()
    np.testing.assert_array_equal(np.nonzero(ends)[0], [99, 149, 249, 449, 949])


def test_schedule_shrinks_proportionally_and_degrades_to_fast():
    from blackjax_tpu.adaptation.staged_adaptation import build_schedule

    # tiny warmup: no slow windows at all
    sched = np.asarray(build_schedule(19))
    assert (sched[:, 0] == 0).all() and not sched[:, 1].any()

    # short warmup: buffers shrink to 15% / 10%, one slow window, flag set
    # exactly once at the end of the slow phase
    sched = np.asarray(build_schedule(100))
    stages, ends = sched[:, 0], sched[:, 1]
    assert (stages[:15] == 0).all()
    assert (stages[15:90] == 1).all()
    assert (stages[90:] == 0).all()
    np.testing.assert_array_equal(np.nonzero(ends)[0], [89])
