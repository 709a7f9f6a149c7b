"""Unit-level invariant pins for the meta-adaptation ("auto" metric) core.

Scenario-class parity target: the reference's
``tests/adaptation/test_meta_builders_e2e.py`` invariant classes — budget
deadline gating, window-capacity schedule laws, IMM-type invariants
(always low-rank-typed, diagonal spelled as U=0/lam=1), the
``converged_at_step`` AIRM sentinel, and the r2 sanitizer. The pins are
closed-form against OUR helper definitions in
``blackjax_tpu/adaptation/meta/builders.py``.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.meta._calibration import (
    _AIRM_VELOCITY_TOL,
    _MAX_RANK_CAP,
    _MIN_TRAIN_K_RATIO,
    _STEP_SIZE_READAPT_BUFFER,
)
from blackjax_tpu.adaptation.meta.builders import (
    _deadline_gate,
    _diag_as_low_rank,
    _effective_rank,
    _masked_moments,
    _sanitize_r2,
    _select_imm,
    _window_capacity,
    build_meta_adaptation_core,
)
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix


# ---------------------------------------------------------------------------
# window-capacity schedule laws
# ---------------------------------------------------------------------------


def test_window_capacity_floor_and_ceiling():
    # half the budget, floored at 256 ...
    assert _window_capacity(1000, 1) == 500
    assert _window_capacity(400, 1) == 256
    # ... but never exceeding the budget itself
    assert _window_capacity(100, 1) == 100
    assert _window_capacity(256, 1) == 256


def test_window_capacity_training_ratio_minimum():
    """High rank caps force the 2(k+1)*ratio training minimum."""
    k = 40
    want_min = 2 * (k + 1) * _MIN_TRAIN_K_RATIO  # 328 > 256 floor
    assert want_min > 256
    assert _window_capacity(1000, k) == max(500, want_min)
    # budget below the training minimum: budget wins (overflow wraps)
    assert _window_capacity(300, k) == 300


@pytest.mark.parametrize(
    "cap,d,expected",
    [
        (50, 100, 50),
        (50, 10, 5),  # d//2 binds
        (50, 1, 1),  # floor at 1
        (3, 100, 3),  # explicit cap binds
        (1000, 10_000, _MAX_RANK_CAP),  # static allocation cap binds
    ],
)
def test_effective_rank_law(cap, d, expected):
    assert _effective_rank(cap, d) == expected


# ---------------------------------------------------------------------------
# budget-deadline gate
# ---------------------------------------------------------------------------


def test_deadline_blocks_tight_budget():
    """An escalation to rank k needs 2k training steps plus the step-size
    re-adaptation buffer; one step less must block."""
    k = 10
    need = 2 * k + _STEP_SIZE_READAPT_BUFFER
    budget = 1000
    assert bool(_deadline_gate(budget, jnp.int32(budget - need), k))
    assert not bool(_deadline_gate(budget, jnp.int32(budget - need + 1), k))


def test_deadline_zero_budget_always_blocks():
    assert not bool(_deadline_gate(0, jnp.int32(0), 1))


# ---------------------------------------------------------------------------
# IMM type invariants
# ---------------------------------------------------------------------------


def test_diagonal_imm_is_low_rank_typed_u_zero_lam_one():
    sigma = jnp.array([1.0, 2.0, 0.5])
    imm = _diag_as_low_rank(sigma, 2)
    assert isinstance(imm, LowRankInverseMassMatrix)
    np.testing.assert_array_equal(np.asarray(imm.U), np.zeros((3, 2)))
    np.testing.assert_array_equal(np.asarray(imm.lam), np.ones(2))
    np.testing.assert_array_equal(np.asarray(imm.sigma), np.asarray(sigma))


def test_select_imm_routes_by_escalation():
    sigma = jnp.ones(4)
    lr = LowRankInverseMassMatrix(
        sigma=2.0 * sigma, U=jnp.eye(4, 2), lam=jnp.array([3.0, 2.0])
    )
    picked = _select_imm(jnp.array(True), lr, sigma, 2)
    np.testing.assert_array_equal(np.asarray(picked.lam), [3.0, 2.0])
    picked = _select_imm(jnp.array(False), lr, sigma, 2)
    assert isinstance(picked, LowRankInverseMassMatrix)
    np.testing.assert_array_equal(np.asarray(picked.U), np.zeros((4, 2)))
    np.testing.assert_array_equal(np.asarray(picked.lam), np.ones(2))


# ---------------------------------------------------------------------------
# r2 sanitizer + masked moments
# ---------------------------------------------------------------------------


def test_sanitize_r2_garbage_cap_and_passthrough():
    r2 = jnp.array([-50.0, 0.5, 1.7, -0.2])
    out = np.asarray(_sanitize_r2(r2))
    assert np.isnan(out[0])  # garbage fit -> deferred (NaN)
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 1.0  # capped
    assert out[3] == pytest.approx(-0.2)


def test_masked_moments_match_numpy_prefix():
    rows = jnp.arange(12.0).reshape(6, 2)
    mean, var = _masked_moments(rows, jnp.int32(4))
    ref = np.asarray(rows)[:4]
    np.testing.assert_allclose(np.asarray(mean), ref.mean(0), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), ref.var(0, ddof=1), rtol=1e-6)


def test_masked_moments_degenerate_counts_are_finite():
    rows = jnp.ones((4, 3))
    for n in (0, 1):
        mean, var = _masked_moments(rows, jnp.int32(n))
        assert np.all(np.isfinite(np.asarray(mean)))
        assert np.all(np.isfinite(np.asarray(var)))


# ---------------------------------------------------------------------------
# converged_at_step sentinel (AIRM advisory)
# ---------------------------------------------------------------------------


def test_core_init_sentinel_and_imm_type(rng_key):
    core = build_meta_adaptation_core(20_000, max_rank=4)
    state = core.init(6)
    assert int(state.converged_at_step) == -1
    assert not bool(state.has_escalated)
    # the emitted IMM is low-rank-typed from step zero
    assert isinstance(state.inverse_mass_matrix, LowRankInverseMassMatrix)


def test_airm_sentinel_requires_two_quiet_windows():
    """converged_at_step latches only after TWO consecutive sub-tolerance
    AIRM velocity readings post-escalation, and never un-latches."""
    from blackjax_tpu.adaptation.meta.builders import _airm_advance

    class S:
        prev_lam = jnp.zeros(2)
        airm_vel_curr = jnp.asarray(10.0, jnp.float32)  # loud previous window
        converged_at_step = jnp.asarray(-1, jnp.int32)
        budget_used = jnp.asarray(100, jnp.int32)

    quiet_lam = jnp.full(2, _AIRM_VELOCITY_TOL / 10.0)
    esc = jnp.array(True)
    # first quiet window: prev is loud -> no latch
    vel_prev, vel_curr, conv = _airm_advance(S, quiet_lam, esc)
    assert int(conv) == -1 and float(vel_curr) < _AIRM_VELOCITY_TOL

    class S2(S):
        airm_vel_curr = vel_curr
        budget_used = jnp.asarray(150, jnp.int32)

    # second quiet window: both sub-tol -> latch at current budget_used
    _, _, conv = _airm_advance(S2, quiet_lam, esc)
    assert int(conv) == 150

    class S3(S2):
        converged_at_step = conv
        budget_used = jnp.asarray(400, jnp.int32)

    # already latched: stays at the first firing
    _, _, conv2 = _airm_advance(S3, quiet_lam, esc)
    assert int(conv2) == 150


def test_airm_never_latches_without_escalation():
    from blackjax_tpu.adaptation.meta.builders import _airm_advance

    class S:
        prev_lam = jnp.zeros(2)
        airm_vel_curr = jnp.asarray(0.0, jnp.float32)
        converged_at_step = jnp.asarray(-1, jnp.int32)
        budget_used = jnp.asarray(100, jnp.int32)

    _, _, conv = _airm_advance(S, jnp.zeros(2), jnp.array(False))
    assert int(conv) == -1
