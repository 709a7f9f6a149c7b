"""Meta-adaptation controller tests.

Parity model: ``blackjax/tests/adaptation/test_meta_adaptation.py``
(signal-level unit tests on synthetic draws with known structure, plus
end-to-end metric="auto" runs on escalate-worthy vs stay-diagonal targets).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.meta import (
    build_meta_adaptation_core,
    build_multi_chain_meta_core,
    extract_meta_verdict,
    extract_multi_chain_verdict,
)
from blackjax_tpu.adaptation.meta._calibration import (
    _mc_detection_edge,
    _w_branch_null_edge,
    _w_branch_psi_threshold,
)
from blackjax_tpu.adaptation.meta._detection import (
    _between_chain_detection,
    _compute_chain_consistency_psi,
    _compute_within_chain_stats,
    _unimodality_gap_stat,
)
from blackjax_tpu.adaptation.meta._signals import (
    _choose_rank,
    _compute_r2_score_linearity,
    _compute_s_gap,
    _compute_whitened_spectrum,
)
from blackjax_tpu.adaptation.meta._schedule import _build_mc_window_schedule
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix


def _gaussian_draws_grads(key, cov, n):
    d = cov.shape[0]
    chol = jnp.linalg.cholesky(cov)
    draws = jax.random.normal(key, (n, d)) @ chol.T
    grads = -draws @ jnp.linalg.inv(cov).T
    return draws, grads


# ---------------------------------------------------------------------------
# Signals
# ---------------------------------------------------------------------------


def test_whitened_spectrum_and_rank_selection():
    d, n = 6, 800
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v, v)
    draws, _ = _gaussian_draws_grads(jax.random.key(0), cov, n)
    sigma = jnp.std(draws, axis=0)
    eigs, U_k = _compute_whitened_spectrum(draws, sigma, jnp.asarray(n), 4)
    # whitened top eigenvalue 25/5 = 5; remaining near 1/... well below
    assert 3.0 < float(eigs[0]) < 7.0
    assert abs(float(U_k[:, 0] @ v)) > 0.98
    # one spike at 5 pushes the rest to 0.2 in the correlation — ALL
    # directions are informative (outside [1/2, 2]), capped at max_rank
    k = _choose_rank(eigs, jnp.asarray(n), 4)
    assert int(k) == 4
    s_gap = _compute_s_gap(eigs, k)
    assert float(s_gap) > 2.0
    # k = 0 -> S_gap = 1 exactly
    assert float(_compute_s_gap(eigs, jnp.asarray(0))) == 1.0


def test_r2_linear_vs_funnel():
    """A Gaussian's score is exactly linear (R^2 ~ 1); a funnel's is not."""
    d, n = 4, 600
    key = jax.random.key(1)
    draws, grads = _gaussian_draws_grads(key, jnp.eye(d) + 0.5, n)
    sigma = jnp.std(draws, axis=0)
    _, U_k = _compute_whitened_spectrum(draws, sigma, jnp.asarray(n), 2)
    r2, mode = _compute_r2_score_linearity(
        draws, grads, sigma, jnp.asarray(n), U_k, 2
    )
    assert float(r2) > 0.9 and int(mode) == 2  # full affine

    # funnel draws: x0 ~ N(0,1), x1 | x0 ~ N(0, e^{x0}); score is nonlinear
    k1, k2 = jax.random.split(key)
    x0 = jax.random.normal(k1, (n,))
    rest = jax.random.normal(k2, (n, d - 1)) * jnp.exp(x0 / 2)[:, None]
    fdraws = jnp.concatenate([x0[:, None], rest], axis=1)

    def flogdensity(x):
        return -0.5 * x[0] ** 2 - 0.5 * jnp.sum(x[1:] ** 2) * jnp.exp(-x[0]) - (
            (d - 1) / 2
        ) * x[0]

    fgrads = jax.vmap(jax.grad(flogdensity))(fdraws)
    fsigma = jnp.std(fdraws, axis=0)
    _, fU_k = _compute_whitened_spectrum(fdraws, fsigma, jnp.asarray(n), 2)
    fr2, _ = _compute_r2_score_linearity(
        fdraws, fgrads, fsigma, jnp.asarray(n), fU_k, 2
    )
    assert float(fr2) < 0.5  # curvature gate blocks the funnel


# ---------------------------------------------------------------------------
# Multi-chain detection
# ---------------------------------------------------------------------------


def test_between_chain_detection_spike_and_null():
    M, d, n = 8, 10, 60
    key = jax.random.key(2)
    v = jnp.zeros(d).at[0].set(1.0)
    # spike: chain means displaced +-10 along v; within-chain unit noise
    offsets = jnp.linspace(-10, 10, M)[:, None] * v[None, :]
    draws = jax.random.normal(key, (M, n, d)) + offsets[:, None, :]
    means, W = _compute_within_chain_stats(draws, jnp.asarray(n))
    T_eigs, V_top, f1 = _between_chain_detection(means, W, jnp.asarray(n), M, d)
    edge = _mc_detection_edge(d, M - 1)
    assert float(T_eigs[0]) > edge
    assert float(f1) > 0.9
    assert abs(float(V_top[:, 0] @ v)) > 0.95

    # null: iid chains, top eigenvalue stays near the edge, f1 small
    draws0 = jax.random.normal(jax.random.key(3), (M, n, d))
    means0, W0 = _compute_within_chain_stats(draws0, jnp.asarray(n))
    T0, _, f1_0 = _between_chain_detection(means0, W0, jnp.asarray(n), M, d)
    assert float(f1_0) < 0.7


def test_unimodality_gap_stat():
    M, d = 8, 3
    v = jnp.zeros(d).at[0].set(1.0)
    # two tight clusters -> large gap ratio -> mode-split flag
    split = jnp.concatenate([jnp.zeros(4), jnp.ones(4) * 50.0])
    means = split[:, None] * v[None, :] + 0.01 * jax.random.normal(
        jax.random.key(4), (M, d)
    )
    is_uni, ratio = _unimodality_gap_stat(means, v, M)
    assert not bool(is_uni) and float(ratio) > 4.54
    # evenly spread means -> unimodal
    means2 = jnp.linspace(0, 7, M)[:, None] * v[None, :]
    is_uni2, _ = _unimodality_gap_stat(means2, v, M)
    assert bool(is_uni2)


def test_psi_consistency_signal_vs_null():
    M, n, d = 8, 120, 6
    key = jax.random.key(5)
    # shared within-chain correlation structure -> high Psi
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 8.0 * jnp.outer(v, v)
    chol = jnp.linalg.cholesky(cov)
    draws = jax.random.normal(key, (M, n, d)) @ chol.T
    means, W = _compute_within_chain_stats(draws, jnp.asarray(n))
    psi = _compute_chain_consistency_psi(draws, means, W, jnp.asarray(n), M)
    thresh = float(_w_branch_psi_threshold(M, jnp.asarray(n), d))
    assert float(psi) > thresh

    # iid null -> Psi near 0
    draws0 = jax.random.normal(jax.random.key(6), (M, n, d))
    means0, W0 = _compute_within_chain_stats(draws0, jnp.asarray(n))
    psi0 = _compute_chain_consistency_psi(draws0, means0, W0, jnp.asarray(n), M)
    assert abs(float(psi0)) < thresh


def test_mc_window_schedule_pool_aware():
    sched = np.asarray(_build_mc_window_schedule(300, M=8, actual_rank=25))
    assert sched.shape == (300, 2)
    ends = np.flatnonzero(sched[:, 1])
    window_sizes = np.diff(np.concatenate([[-1], ends]))
    # first main window sized ceil(8*26/8)=26 (after the 1-step early window)
    assert 26 in window_sizes


# ---------------------------------------------------------------------------
# Cores end-to-end
# ---------------------------------------------------------------------------


def test_meta_core_escalates_on_planted_low_rank(rng_key):
    """Correlated Gaussian: after two stable windows the controller must
    escalate and deploy a low-rank metric capturing the planted direction."""
    d = 6
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v, v)
    core = build_meta_adaptation_core(200_000, max_rank=3)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        draws, grads = _gaussian_draws_grads(key, cov, 300)
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, grads)
        )
        return core.final(state)

    for key in jax.random.split(rng_key, 3):
        state = run_window(state, key)

    assert bool(state.has_escalated)
    imm = state.inverse_mass_matrix
    assert abs(float(imm.U[:, 0] @ v)) > 0.9
    verdict = extract_meta_verdict(state, 200_000, 900)
    assert verdict.route == "low_rank"
    assert verdict.confidence == "high"
    assert verdict.effective_rank >= 1


def test_meta_core_stays_diagonal_on_isotropic(rng_key):
    """Isotropic Gaussian: no informative eigenvalues -> stay diagonal with
    the Welford sigma."""
    d = 5
    scales = jnp.asarray([0.5, 1.0, 1.5, 2.0, 3.0])
    cov = jnp.diag(scales**2)
    core = build_meta_adaptation_core(200_000, max_rank=3)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        draws, grads = _gaussian_draws_grads(key, cov, 300)
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, grads)
        )
        return core.final(state)

    for key in jax.random.split(rng_key, 3):
        state = run_window(state, key)

    assert not bool(state.has_escalated)
    imm = state.inverse_mass_matrix
    np.testing.assert_allclose(np.asarray(imm.lam), 1.0)  # diagonal route
    np.testing.assert_allclose(np.asarray(imm.sigma), np.asarray(scales), rtol=0.2)
    verdict = extract_meta_verdict(state, 200_000, 900)
    assert verdict.route == "diagonal"


def test_multi_chain_core_escalates_w_branch(rng_key):
    """Shared within-chain correlation across 8 chains: the W-branch
    (whiteness + Psi + oscillation screen) must fire."""
    d, M, n = 6, 8, 250
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v, v)
    chol = jnp.linalg.cholesky(cov)
    prec = jnp.linalg.inv(cov)

    core = build_multi_chain_meta_core(800_000, n_chains=M, max_rank=3)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        z = jax.random.normal(key, (n, M, d))
        draws = z @ chol.T  # (n, M, d)
        grads = -draws @ prec.T
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, grads)
        )
        return core.final(state)

    for key in jax.random.split(rng_key, 2):
        state = run_window(state, key)

    assert bool(state.has_escalated)
    verdict = extract_multi_chain_verdict(state, 800_000, 2 * n * M)
    assert verdict.route == "low_rank"
    assert verdict.flags["detection_branch"] in ("pooled_within", "both")
    assert abs(float(state.inverse_mass_matrix.U[:, 0] @ v)) > 0.9


def test_multi_chain_core_validation():
    with pytest.raises(ValueError, match="n_chains"):
        build_multi_chain_meta_core(10_000, n_chains=1)
    with pytest.warns(UserWarning, match="recommended|unsafe|n_chains"):
        build_multi_chain_meta_core(10_000, n_chains=3)


def test_staged_adaptation_metric_auto(rng_key):
    """metric='auto' end-to-end through the staged engine on a correlated
    Gaussian; must produce usable (step_size, LowRankInverseMassMatrix)."""
    d = 4
    v = jnp.ones(d) / 2.0
    cov = jnp.eye(d) + 12.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x

    with pytest.raises(ValueError, match="max_grad_budget"):
        blackjax_tpu.staged_adaptation(blackjax_tpu.nuts, logdensity, metric="auto")

    from blackjax_tpu.adaptation.low_rank_adaptation import (
        _default_low_rank_adaptation_info_fn,
    )

    warmup = blackjax_tpu.staged_adaptation(
        blackjax_tpu.nuts,
        logdensity,
        metric="auto",
        max_grad_budget=16_000,
        max_num_doublings=6,
        adaptation_info_fn=_default_low_rank_adaptation_info_fn,
    )
    (state, params), info = warmup.run(rng_key, jnp.ones(d), num_steps=500)
    assert 0.01 < float(params["step_size"]) < 10.0
    assert isinstance(params["inverse_mass_matrix"], LowRankInverseMassMatrix)
    final_imm_state = jax.tree.map(
        lambda x: x[-1], info.adaptation_state.imm_state
    )
    verdict = extract_meta_verdict(final_imm_state, 16_000, 500)
    assert verdict.route in ("diagonal", "low_rank")


def test_staged_adaptation_metric_auto_multichain(rng_key):
    """metric='auto' with n_chains > 1 routes to the multi-chain core: the
    vmapped engine feeds (n_chains, d) blocks into the per-chain buffers."""
    from blackjax_tpu.adaptation.low_rank_adaptation import (
        _default_low_rank_adaptation_info_fn,
    )

    d, n_chains = 4, 8
    v = jnp.ones(d) / 2.0
    cov = jnp.eye(d) + 12.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x

    warmup = blackjax_tpu.staged_adaptation(
        blackjax_tpu.nuts,
        logdensity,
        metric="auto",
        max_grad_budget=48_000,
        n_chains=n_chains,
        max_num_doublings=5,
        adaptation_info_fn=_default_low_rank_adaptation_info_fn,
    )
    init_positions = jax.random.normal(rng_key, (n_chains, d)) * 2.0
    (state, params), info = warmup.run(rng_key, init_positions, num_steps=300)
    assert 0.005 < float(params["step_size"]) < 10.0
    imm = params["inverse_mass_matrix"]
    assert isinstance(imm, LowRankInverseMassMatrix)
    final = jax.tree.map(lambda x: x[-1], info.adaptation_state.imm_state)
    verdict = extract_multi_chain_verdict(final, 48_000, 300)
    assert verdict.route in ("diagonal", "low_rank", "reparam_suggested")
    # buffers are stripped by the slimming info fn; n_chains falls back
    assert verdict.flags["n_chains"] in (n_chains, -1)


def test_multi_chain_core_stays_diagonal_on_isotropic(rng_key):
    """Isotropic draws across 8 chains: neither branch may fire — the null
    guard of the multi-chain detector (false escalation would deploy a junk
    low-rank metric on every well-conditioned problem)."""
    d, M, n = 6, 8, 250
    core = build_multi_chain_meta_core(800_000, n_chains=M, max_rank=3)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        draws = jax.random.normal(key, (n, M, d))
        grads = -draws
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, grads)
        )
        return core.final(state)

    for key in jax.random.split(rng_key, 2):
        state = run_window(state, key)

    assert not bool(state.has_escalated)
    verdict = extract_multi_chain_verdict(state, 800_000, 2 * n * M)
    assert verdict.route == "diagonal"


def test_multi_chain_core_mode_split_does_not_escalate():
    """Chains parked at two separated modes look like a between-chain spike,
    but the unimodality gate must veto the escalation — a bimodal target
    needs reparameterization/ensemble handling, not a low-rank metric.

    FIXED key, deliberately: the T-branch's still-converging override
    (reference ``blackjax/adaptation/meta/builders.py:682-695``, ours
    ``meta/builders.py``) accepts an alpha=2.5%-per-window escape by
    design (contraction t < -2.365), so over 3 windows a rotating daily
    seed fails ~7-17% of days (measured 2/12 with tools/seed_sweep.py,
    2026-08-19) without any regression. The scenario-class behavior under
    a pinned stream is the stable contract; the alpha level itself is the
    reference's calibration, not ours to tighten."""
    rng_key = jax.random.key(20260111)
    d, M, n = 6, 8, 250
    v = jnp.ones(d) / jnp.sqrt(d)
    centers = jnp.where((jnp.arange(M) % 2 == 0)[:, None], 8.0 * v, -8.0 * v)

    core = build_multi_chain_meta_core(800_000, n_chains=M, max_rank=3)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        z = jax.random.normal(key, (n, M, d))
        draws = centers[None, :, :] + 0.3 * z  # tight isotropic local modes
        grads = -(draws - centers[None, :, :]) / 0.09
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, grads)
        )
        return core.final(state)

    for key in jax.random.split(rng_key, 3):
        state = run_window(state, key)

    assert not bool(state.has_escalated)
    # the detector saw the structure but routed it to the ensemble/reparam
    # path instead of deploying a metric
    assert bool(state.deferred_to_ensemble) or int(state.unimodality_flag_count) > 0
