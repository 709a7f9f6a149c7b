"""Meta-adaptation calibration surface and detection-edge behavior:
threshold monotonicities, rank selection, oscillation and dispersion
safety, and verdict field semantics.

Scenario parity targets in the reference suite:
``tests/adaptation/test_meta_detection.py`` (edge monotonicity, oscillatory
no-false-escalate, under-dispersed safety), ``test_meta_signals.py`` (rank
and s-gap selection), ``test_meta_verdict.py`` (effective-rank fields).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.meta import (
    build_meta_adaptation_core,
    build_multi_chain_meta_core,
    extract_meta_verdict,
    extract_multi_chain_verdict,
)
from blackjax_tpu.adaptation.meta._calibration import (
    _mc_detection_edge,
    _mc_unimodality_threshold,
    _w_branch_null_edge,
    _w_branch_psi_threshold,
)
from blackjax_tpu.adaptation.meta._signals import _choose_rank, _compute_s_gap

# ---------------------------------------------------------------------------
# threshold monotonicities
# ---------------------------------------------------------------------------


def test_detection_edge_monotonicities():
    # the MP bulk edge grows with dimension and shrinks with dof
    assert _mc_detection_edge(20, 7) > _mc_detection_edge(10, 7)
    assert _mc_detection_edge(10, 15) < _mc_detection_edge(10, 7)
    # exact value: (1 + sqrt(d/dof))^2
    np.testing.assert_allclose(_mc_detection_edge(9, 9), 4.0, rtol=1e-12)


def test_w_branch_null_edge_monotonicities():
    # more pooled draws -> tighter edge; higher dimension -> wider edge
    assert float(_w_branch_null_edge(8, 500, 10)) < float(
        _w_branch_null_edge(8, 100, 10)
    )
    assert float(_w_branch_null_edge(8, 100, 50)) > float(
        _w_branch_null_edge(8, 100, 10)
    )
    # never below the Tracy-Widom-inflated unit bulk
    assert float(_w_branch_null_edge(8, 10**9, 2)) >= 1.02


def test_w_branch_psi_threshold_floor_and_decay():
    # the Psi gate never drops below the flat floor
    assert float(_w_branch_psi_threshold(8, 10**9, 50)) >= 0.15
    # and is (weakly) decreasing in dimension at fixed N per the anchors
    t10 = float(_w_branch_psi_threshold(8, 171, 10))
    t50 = float(_w_branch_psi_threshold(8, 171, 50))
    assert t50 <= t10


def test_unimodality_threshold_table_and_formula():
    # calibrated table entries
    assert _mc_unimodality_threshold(8) == 4.54
    assert _mc_unimodality_threshold(6) == 3.8
    # conservative formula beyond the table: max(0.5 (M-1), 3)
    assert _mc_unimodality_threshold(16) == 7.5
    assert _mc_unimodality_threshold(4) == 3.0


# ---------------------------------------------------------------------------
# rank selection and s-gap
# ---------------------------------------------------------------------------


def test_choose_rank_counts_above_cutoff():
    evals = jnp.array([9.0, 5.0, 2.5, 1.0, 0.5])
    n = jnp.asarray(1000)  # support count is traced inside the engine
    # cutoff 2.0: three eigenvalues qualify, capped by max_rank
    assert int(_choose_rank(evals, n=n, max_rank=10)) == 3
    assert int(_choose_rank(evals, n=n, max_rank=2)) == 2
    # nothing informative -> rank 0
    assert int(_choose_rank(jnp.ones(5) * 1.1, n=n, max_rank=5)) == 0
    # tiny support caps the rank at n // 2
    assert int(_choose_rank(evals, n=jnp.asarray(4), max_rank=10)) == 2


def test_s_gap_orders_by_spectral_payoff():
    flat = jnp.array([1.2, 1.1, 1.0, 0.9])
    spiked = jnp.array([30.0, 1.1, 1.0, 0.9])
    k = jnp.asarray(1)
    assert float(_compute_s_gap(spiked, k)) > float(_compute_s_gap(flat, k))
    # S_gap(k) = lam_1 / lam_{k+1}
    np.testing.assert_allclose(float(_compute_s_gap(spiked, k)), 30.0 / 1.1, rtol=1e-6)


# ---------------------------------------------------------------------------
# detection safety: oscillation and dispersion
# ---------------------------------------------------------------------------


def _run_mc_windows(core, state, draws_fn, rng_key, n_windows=2):
    @jax.jit
    def run_window(state, key):
        draws, grads = draws_fn(key)
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, grads)
        )
        return core.final(state)

    for key in jax.random.split(rng_key, n_windows):
        state = run_window(state, key)
    return state


def test_oscillatory_direction_does_not_escalate(rng_key):
    """A strongly ANTI-correlated (lag-1 ~ -0.9) direction inflates the
    within-chain spectrum but is an integrator artifact, not geometry; the
    oscillation screen must veto the escalation."""
    d, M, n = 6, 8, 250
    v = jnp.ones(d) / jnp.sqrt(d)

    def draws_fn(key):
        z = jax.random.normal(key, (n, M, d))
        # oscillation along v: alternating sign large component
        signs = jnp.where(jnp.arange(n) % 2 == 0, 1.0, -1.0)
        osc = 5.0 * signs[:, None, None] * v[None, None, :]
        draws = z + osc
        grads = -draws
        return draws, grads

    core = build_multi_chain_meta_core(800_000, n_chains=M, max_rank=3)
    state = _run_mc_windows(core, core.init(d), draws_fn, rng_key)
    assert not bool(state.has_escalated)


def test_under_dispersed_start_is_one_sided_safe(rng_key):
    """Chains initialized inside a tight ball (under-dispersed) must not
    trigger the between-means branch: the T statistic is one-sided above
    the bulk edge, and compression sits below it."""
    d, M, n = 6, 8, 250

    def draws_fn(key):
        z = jax.random.normal(key, (n, M, d))
        # shrink the between-chain spread: every chain shares one center
        center = 0.01 * jax.random.normal(jax.random.fold_in(key, 1), (1, 1, d))
        draws = 0.9 * z + center
        return draws, -draws

    core = build_multi_chain_meta_core(800_000, n_chains=M, max_rank=3)
    state = _run_mc_windows(core, core.init(d), draws_fn, rng_key)
    assert not bool(state.has_escalated)
    verdict = extract_multi_chain_verdict(state, 800_000, 2 * n * M)
    assert verdict.route == "diagonal"


def test_mode_split_with_isotropic_within_does_not_escalate(rng_key):
    """Chains split across two modes with isotropic within-chain scatter:
    the between-means spike is real but the collinearity/unimodality gates
    must hold escalation back (a mode split is not metric-fixable)."""
    d, M, n = 6, 8, 250
    v = jnp.zeros(d).at[0].set(1.0)

    def draws_fn(key):
        z = jax.random.normal(key, (n, M, d))
        mode = jnp.where(jnp.arange(M) % 2 == 0, 6.0, -6.0)
        return z + mode[None, :, None] * v[None, None, :], -z

    core = build_multi_chain_meta_core(800_000, n_chains=M, max_rank=3)
    state = _run_mc_windows(core, core.init(d), draws_fn, rng_key, n_windows=3)
    assert not bool(state.has_escalated)


# ---------------------------------------------------------------------------
# verdict fields
# ---------------------------------------------------------------------------


def test_verdict_effective_rank_zero_before_escalation(rng_key):
    d = 5
    core = build_meta_adaptation_core(200_000, max_rank=3)
    state = core.init(d)
    # a single short isotropic window: no escalation possible yet
    draws = jax.random.normal(rng_key, (100, d))
    state, _ = jax.lax.scan(
        lambda s, xg: (core.update(s, xg[0], xg[1]), None), state, (draws, -draws)
    )
    state = core.final(state)
    assert not bool(state.has_escalated)
    verdict = extract_meta_verdict(state, 200_000, 100)
    assert verdict.effective_rank == 0
    assert verdict.route == "diagonal"


def test_verdict_effective_rank_bounded_by_cap(rng_key):
    """After escalation on an oblique planted structure, the deployed
    effective rank is between 1 and the cap (axis-aligned structure would
    be absorbed by the diagonal sigma and correctly never escalate)."""
    d = 6
    v1 = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v1, v1)
    chol = jnp.linalg.cholesky(cov)
    prec = jnp.linalg.inv(cov)
    core = build_meta_adaptation_core(200_000, max_rank=2)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        z = jax.random.normal(key, (300, d))
        draws = z @ chol.T
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None),
            state,
            (draws, -draws @ prec.T),
        )
        return core.final(state)

    for key in jax.random.split(rng_key, 3):
        state = run_window(state, key)
    assert bool(state.has_escalated)
    verdict = extract_meta_verdict(state, 200_000, 900)
    assert 1 <= verdict.effective_rank <= 2
    assert 1 <= verdict.flags["nominal_rank"] <= 2


# ---------------------------------------------------------------------------
# planted-structure e2e grid (single-chain core over full windows)
# ---------------------------------------------------------------------------


def _run_core_windows(rng_key, cov, max_rank=3, windows=3, n=300):
    d = cov.shape[0]
    chol = jnp.linalg.cholesky(cov)
    prec = jnp.linalg.inv(cov)
    core = build_meta_adaptation_core(200_000, max_rank=max_rank)
    state = core.init(d)

    @jax.jit
    def run_window(state, key):
        z = jax.random.normal(key, (n, d))
        draws = z @ chol.T
        state, _ = jax.lax.scan(
            lambda s, xg: (core.update(s, xg[0], xg[1]), None),
            state,
            (draws, -draws @ prec.T),
        )
        return core.final(state)

    for key in jax.random.split(rng_key, windows):
        state = run_window(state, key)
    return state, extract_meta_verdict(state, 200_000, n * windows)


def _grid_covs():
    d = 6
    v1 = jnp.ones(d) / jnp.sqrt(d)
    v2 = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0]) / jnp.sqrt(d)
    return {
        # oblique rank-2 inflation: the ONLY structure a diagonal cannot fix
        "oblique-rank2": (
            jnp.eye(d) + 24.0 * jnp.outer(v1, v1) + 18.0 * jnp.outer(v2, v2),
            "low_rank",
        ),
        # axis-aligned spike: absorbed by the Welford sigma, stays diagonal
        "axis-spike": (jnp.eye(d).at[0, 0].set(25.0), "diagonal"),
        # pure anisotropy: diagonal is the right answer
        "aniso-diag": (
            jnp.diag(jnp.array([0.25, 1.0, 4.0, 9.0, 1.0, 0.5])),
            "diagonal",
        ),
        # compressed oblique direction: the detector is one-sided (upper
        # bulk edge of the whitened spectrum), so a compression does not
        # escalate — pinned as deliberate behavior
        "compressed-oblique": (jnp.eye(d) - 0.9 * jnp.outer(v1, v1), "diagonal"),
    }


@pytest.mark.parametrize("name", list(_grid_covs()))
def test_planted_structure_grid_routes(name, rng_key):
    cov, expected_route = _grid_covs()[name]
    state, verdict = _run_core_windows(rng_key, cov)
    assert verdict.route == expected_route, (name, verdict.route)
    if expected_route == "low_rank":
        assert bool(state.has_escalated)
        assert verdict.effective_rank >= 2  # both planted directions found
    else:
        assert not bool(state.has_escalated)
        assert verdict.effective_rank == 0


def test_planted_grid_diagonal_sigma_tracks_scales(rng_key):
    scales = jnp.array([0.25, 1.0, 4.0, 9.0, 1.0, 0.5])
    state, verdict = _run_core_windows(rng_key, jnp.diag(scales))
    np.testing.assert_allclose(
        np.asarray(state.inverse_mass_matrix.sigma) ** 2,
        np.asarray(scales),
        rtol=0.25,
    )


def test_planted_grid_low_rank_captures_subspace(rng_key):
    d = 6
    v1 = jnp.ones(d) / jnp.sqrt(d)
    v2 = jnp.array([1.0, -1.0, 1.0, -1.0, 1.0, -1.0]) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v1, v1) + 18.0 * jnp.outer(v2, v2)
    state, _ = _run_core_windows(rng_key, cov)
    assert bool(state.has_escalated)
    U = np.asarray(state.inverse_mass_matrix.U)
    # the deployed columns span the planted plane: projecting each planted
    # direction onto the column space keeps (almost) all of its norm
    proj = U @ (U.T @ np.stack([np.asarray(v1), np.asarray(v2)], axis=1))
    np.testing.assert_allclose(
        np.linalg.norm(proj, axis=0), [1.0, 1.0], atol=0.1
    )
