"""MetricCore builders for the meta-adaptation controller: the window-
boundary decision logic that auto-escalates diagonal -> low-rank.

Behavioral parity target: ``blackjax/adaptation/meta/builders.py``
(``build_meta_adaptation_core`` :89 — single-chain escalation iff the R^2
curvature gate, the two-consecutive-window-stable S_gap magnitude gate, and
the budget deadline all pass; ``build_multi_chain_meta_core`` :312 — the
v2.1 W-branch (pooled within-chain whiteness + Psi consistency + oscillation
screen) UNION T-branch (between-means spike + collinearity + leave-one-out +
three-way unimodality rule), with the projected-tier GAIN router, the
geometric-mean rank-1 deploy scale for T escalations, and the non-monotone
``deferred_to_ensemble`` latch).

Single-chain decision summary: escalate iff
``r2 >= 0.5  AND  s_gap >= 2 stable over two windows  AND  budget left``.
Pre-escalation the deployed metric is the Welford diagonal (measured better
than the Fisher diagonal on every stay-diagonal class); post-escalation it
is the Fisher low-rank metric (nutpie Algorithm 1).

Structure: both cores share a ring-buffer writer, a masked-moment reducer,
a budget/deadline gate, low-rank metric assembly helpers, and the AIRM
advisory bookkeeping; decisions are expressed through small named predicate
helpers rather than inline conjunction chains.
"""
import warnings

import jax
import jax.flatten_util as fu
import jax.numpy as jnp

from blackjax_tpu.adaptation.meta._calibration import (
    _AIRM_VELOCITY_TOL,
    _ASSUMED_AVG_LEAPFROGS_PER_STEP,
    _DETECTION_BRANCH_BETWEEN_MEANS,
    _DETECTION_BRANCH_BOTH,
    _DETECTION_BRANCH_NONE,
    _DETECTION_BRANCH_POOLED_WITHIN,
    _GAIN_THRESHOLD,
    _MAX_RANK_CAP,
    _MC_COLLINEARITY_TOL,
    _MC_MIN_CHAINS,
    _MC_UNIMODALITY_CONFIRM_WINDOWS,
    _MIN_TRAIN_K_RATIO,
    _MULTI_CHAIN_DEFAULT_N_CHAINS,
    _R2_DEFERRED,
    _R2_PROJECTED,
    _R_MIN,
    _S_GAP_STABILITY_TOL,
    _S_MIN,
    _STEP_SIZE_READAPT_BUFFER,
    _W_BRANCH_R1_TOL,
    _mc_detection_edge,
    _w_branch_null_edge,
    _w_branch_psi_threshold,
)
from blackjax_tpu.adaptation.meta._detection import (
    _between_chain_detection,
    _compute_chain_consistency_psi,
    _compute_contraction_stat,
    _compute_lag1_autocorr_top_dir,
    _compute_mode_consistency_flag,
    _compute_pooled_within_spectrum,
    _compute_within_chain_stats,
    _loo_detection_passes,
    _unimodality_gap_stat,
)
from blackjax_tpu.adaptation.meta._router import (
    _build_pc_centered_time_major_pool,
    _compute_projected_gain_r2_mc,
    _geometric_mean_deploy_scale,
)
from blackjax_tpu.adaptation.meta._signals import (
    _choose_rank,
    _compute_r2_score_linearity,
    _compute_s_gap,
    _compute_transient_mixing_signal,
    _compute_whitened_spectrum,
)
from blackjax_tpu.adaptation.meta._state import (
    MetaAdaptationCoreState,
    MultiChainMetaAdaptationCoreState,
)
from blackjax_tpu.adaptation.metric_estimators import _compute_low_rank_metric
from blackjax_tpu.adaptation.metric_recipes import MetricCore
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.types import Array, ArrayLikeTree

__all__ = ["build_meta_adaptation_core", "build_multi_chain_meta_core"]


# --------------------------------------------------------------------------
# shared machinery
# --------------------------------------------------------------------------


def _window_capacity(budget_steps: int, rank_cap: int) -> int:
    """Rows to allocate for one window's draw/grad buffers: half the step
    budget, floored at 256 and at the training-ratio minimum for the rank
    cap, never exceeding the budget itself (overflow wraps; RESET keeps the
    newest rows)."""
    rows = min(max(budget_steps // 2, 256), budget_steps)
    rows = max(rows, 2 * (rank_cap + 1) * _MIN_TRAIN_K_RATIO)
    return min(rows, budget_steps)


def _effective_rank(rank_cap: int, n_dims: int) -> int:
    return min(rank_cap, max(n_dims // 2, 1), _MAX_RANK_CAP)


def _ring_write(buffer: Array, row: Array, slot) -> Array:
    """Write one flattened sample into the wrap-around window buffer."""
    return buffer.at[slot].set(row)


def _push_pair(state, position, grad):
    """Shared update body: flatten and append one (position, gradient) pair
    per chain into the ring buffers."""
    slot = state.buffer_idx % state.draws_buffer.shape[-2]
    pos_flat = fu.ravel_pytree(position)[0]
    grad_flat = fu.ravel_pytree(grad)[0]
    return (
        _ring_write(state.draws_buffer, pos_flat, slot),
        _ring_write(state.grads_buffer, grad_flat, slot),
    )


def _masked_moments(rows: Array, n):
    """Mean and (n-1)-normalized variance of the first ``n`` rows."""
    count = n.astype(rows.dtype)
    alive = (jnp.arange(rows.shape[0]) < n).astype(rows.dtype)[:, None]
    mean = (alive * rows).sum(0) / jnp.maximum(count, 1.0)
    ss = (alive * jnp.square(rows - mean[None, :])).sum(0)
    return mean, ss / jnp.maximum(count - 1.0, 1.0)


def _sanitize_r2(r2):
    """Garbage fits (< -10) go to NaN (the deferred path); cap at 1."""
    bad = r2 < -10.0
    return jnp.where(bad, jnp.asarray(float("nan"), r2.dtype), jnp.clip(r2, max=1.0))


def _deadline_gate(budget_steps: int, used_steps, k_new):
    """Enough budget must remain to exploit an escalation: 2k training steps
    plus the step-size re-adaptation buffer."""
    left = jnp.int32(budget_steps) - used_steps.astype(jnp.int32)
    return left >= 2 * k_new + jnp.int32(_STEP_SIZE_READAPT_BUFFER)


def _diag_as_low_rank(sigma, rank):
    """A pure-diagonal metric in LowRankInverseMassMatrix clothing (U=0)."""
    return LowRankInverseMassMatrix(
        sigma=sigma,
        U=jnp.zeros((sigma.shape[0], rank), sigma.dtype),
        lam=jnp.ones(rank, sigma.dtype),
    )


def _select_imm(escalated, lr_imm, sigma_diag, rank):
    """Deploy the low-rank candidate when escalated, else the diagonal."""
    diag_imm = _diag_as_low_rank(sigma_diag, rank)
    return jax.lax.cond(escalated, lambda: lr_imm, lambda: diag_imm)


def _airm_advance(state, lam_lr, escalated):
    """AIRM-velocity advisory bookkeeping: track the lam change norm
    post-escalation; record the first step where two consecutive windows are
    below tolerance."""
    lam_step = jnp.linalg.norm(lam_lr - state.prev_lam.astype(lam_lr.dtype)).astype(
        jnp.float32
    )
    vel_prev = state.airm_vel_curr
    vel_curr = jnp.where(escalated, lam_step, state.airm_vel_curr)
    settled = escalated & (vel_curr < _AIRM_VELOCITY_TOL) & (vel_prev < _AIRM_VELOCITY_TOL)
    converged_at = jnp.where(
        (state.converged_at_step < 0) & settled,
        state.budget_used,
        state.converged_at_step,
    )
    return vel_prev, vel_curr, converged_at


# --------------------------------------------------------------------------
# single-chain core
# --------------------------------------------------------------------------


def build_meta_adaptation_core(
    max_grad_budget: int,
    *,
    max_rank=None,
    gamma: float = 1e-5,
    cutoff: float = 2.0,
) -> MetricCore:
    """Single-chain meta-adaptation MetricCore (the ``metric="auto"`` path).

    ``max_grad_budget`` (leapfrog evaluations) is converted to warmup steps
    via the conservative 20-grads-per-step assumption. Prefer x64 — the
    Fisher estimator pipeline is f32-fragile.
    """
    rank_cap = _MAX_RANK_CAP if max_rank is None else max_rank
    budget_steps = max(max_grad_budget // _ASSUMED_AVG_LEAPFROGS_PER_STEP, 1)

    def init(n_dims: int) -> MetaAdaptationCoreState:
        rows = _window_capacity(budget_steps, rank_cap)
        rank = _effective_rank(rank_cap, n_dims)
        return MetaAdaptationCoreState(
            inverse_mass_matrix=LowRankInverseMassMatrix(
                sigma=jnp.ones(n_dims),
                U=jnp.zeros((n_dims, rank)),
                lam=jnp.ones(rank),
            ),
            mu_star=jnp.zeros(n_dims),
            draws_buffer=jnp.zeros((rows, n_dims)),
            grads_buffer=jnp.zeros((rows, n_dims)),
            buffer_idx=jnp.zeros((), jnp.int32),
            background_split=jnp.zeros((), jnp.int32),
            recompute_counter=jnp.zeros((), jnp.int32),
            has_escalated=jnp.zeros((), jnp.bool_),
            escalation_rank=jnp.zeros((), jnp.int32),
            s_gap_prev=jnp.array(float("nan"), jnp.float32),
            s_gap_curr=jnp.array(float("nan"), jnp.float32),
            r2_latest=jnp.array(float("nan"), jnp.float32),
            r2_mode=jnp.array(_R2_DEFERRED, jnp.int32),
            budget_used=jnp.zeros((), jnp.int32),
            converged_at_step=jnp.array(-1, jnp.int32),
            prev_lam=jnp.ones(rank, jnp.float32),
            airm_vel_prev=jnp.array(float("inf"), jnp.float32),
            airm_vel_curr=jnp.array(float("inf"), jnp.float32),
            is_slow_mixing=jnp.zeros((), jnp.bool_),
        )

    def update(state, position: ArrayLikeTree, grad=None) -> MetaAdaptationCoreState:
        draws, grads = _push_pair(state, position, grad)
        return state._replace(
            draws_buffer=draws,
            grads_buffer=grads,
            buffer_idx=state.buffer_idx + 1,
            budget_used=state.budget_used + 1,
        )

    def final(state: MetaAdaptationCoreState) -> MetaAdaptationCoreState:
        rows, d = state.draws_buffer.shape
        n = jnp.minimum(state.buffer_idx, jnp.int32(rows))
        rank = state.inverse_mass_matrix.U.shape[1]

        # Welford sigma from the window buffer: the stay-diagonal metric AND
        # the whitening basis the S_gap/R^2 anchors were calibrated on
        _, var_x = _masked_moments(state.draws_buffer, n)
        sigma_diag = jnp.sqrt(jnp.maximum(var_x, 1e-10))

        # escalated candidate: full Fisher low-rank metric
        sigma_lr, mu_lr, U_lr, lam_lr = _compute_low_rank_metric(
            state.draws_buffer, state.grads_buffer, n, rank, gamma, cutoff
        )
        lr_imm = LowRankInverseMassMatrix(sigma=sigma_lr, U=U_lr, lam=lam_lr)

        # decision signals
        eigenvalues, U_k = _compute_whitened_spectrum(
            state.draws_buffer, sigma_diag, n, rank
        )
        k_new = _choose_rank(eigenvalues, n, rank, cutoff)
        s_gap = _compute_s_gap(eigenvalues, k_new)
        r2, r2_mode = _compute_r2_score_linearity(
            state.draws_buffer, state.grads_buffer, sigma_diag, n, U_k, rank
        )
        r2 = _sanitize_r2(r2)
        slow_mixing = _compute_transient_mixing_signal(state.draws_buffer, sigma_diag, n)

        # the three gates (NaN R^2 fails its comparison -> no escalation)
        curvature_ok = r2 >= _R_MIN
        drift = jnp.abs(s_gap - state.s_gap_curr) / jnp.maximum(s_gap, 1e-10)
        stability_ok = (
            (s_gap >= _S_MIN)
            & ~jnp.isnan(state.s_gap_curr)
            & (drift < _S_GAP_STABILITY_TOL)
        )
        deadline_ok = _deadline_gate(budget_steps, state.budget_used, k_new)

        fires = ~state.has_escalated & curvature_ok & stability_ok & deadline_ok
        escalated = state.has_escalated | fires

        vel_prev, vel_curr, converged_at = _airm_advance(state, lam_lr, escalated)

        return MetaAdaptationCoreState(
            inverse_mass_matrix=_select_imm(escalated, lr_imm, sigma_diag, rank),
            mu_star=jnp.where(escalated, mu_lr, jnp.zeros_like(mu_lr)),
            draws_buffer=jnp.zeros_like(state.draws_buffer),
            grads_buffer=jnp.zeros_like(state.grads_buffer),
            buffer_idx=jnp.zeros_like(state.buffer_idx),
            background_split=jnp.zeros_like(state.background_split),
            recompute_counter=jnp.zeros_like(state.recompute_counter),
            has_escalated=escalated,
            escalation_rank=jnp.where(fires, k_new, state.escalation_rank),
            s_gap_prev=state.s_gap_curr,
            s_gap_curr=s_gap.astype(jnp.float32),
            r2_latest=r2.astype(jnp.float32),
            r2_mode=r2_mode,
            budget_used=state.budget_used,
            converged_at_step=converged_at,
            prev_lam=lam_lr.astype(jnp.float32),
            airm_vel_prev=vel_prev,
            airm_vel_curr=vel_curr,
            is_slow_mixing=slow_mixing,
        )

    return MetricCore(init=init, update=update, final=final)


# --------------------------------------------------------------------------
# multi-chain core
# --------------------------------------------------------------------------


def build_multi_chain_meta_core(
    max_grad_budget: int,
    n_chains: int = _MULTI_CHAIN_DEFAULT_N_CHAINS,
    *,
    max_rank=None,
    gamma: float = 1e-5,
    cutoff: float = 2.0,
) -> MetricCore:
    """M-chain meta-adaptation MetricCore: W-branch/T-branch union detection
    over pooled chain information (robust to seed variation near the
    escalation edge). ``update`` expects ``(n_chains, d)`` position and
    gradient blocks; ``max_grad_budget`` is the TOTAL across all chains."""
    if n_chains < 2:
        raise ValueError(
            f"build_multi_chain_meta_core: n_chains must be >= 2, got {n_chains}; "
            "use build_meta_adaptation_core for single-chain."
        )
    if n_chains < _MC_MIN_CHAINS:
        warnings.warn(
            f"build_multi_chain_meta_core: n_chains={n_chains} < {_MC_MIN_CHAINS}; "
            "the collinearity null-margin and unimodality gap separation are "
            "unsafe below that. Use n_chains >= 6 (default 8).",
            stacklevel=2,
        )
    rank_cap = _MAX_RANK_CAP if max_rank is None else max_rank
    steps_total = max(max_grad_budget // _ASSUMED_AVG_LEAPFROGS_PER_STEP, 1)
    steps_per_chain = max(steps_total // n_chains, 1)

    def init(n_dims: int) -> MultiChainMetaAdaptationCoreState:
        rows = _window_capacity(steps_per_chain, rank_cap)
        rank = _effective_rank(rank_cap, n_dims)
        return MultiChainMetaAdaptationCoreState(
            inverse_mass_matrix=LowRankInverseMassMatrix(
                sigma=jnp.ones(n_dims),
                U=jnp.zeros((n_dims, rank)),
                lam=jnp.ones(rank),
            ),
            mu_star=jnp.zeros(n_dims),
            draws_buffer=jnp.zeros((n_chains, rows, n_dims)),
            grads_buffer=jnp.zeros((n_chains, rows, n_dims)),
            buffer_idx=jnp.zeros((), jnp.int32),
            background_split=jnp.zeros((), jnp.int32),
            recompute_counter=jnp.zeros((), jnp.int32),
            has_escalated=jnp.zeros((), jnp.bool_),
            escalation_rank=jnp.zeros((), jnp.int32),
            s_gap_prev=jnp.array(float("nan"), jnp.float32),
            s_gap_curr=jnp.array(float("nan"), jnp.float32),
            r2_latest=jnp.array(float("nan"), jnp.float32),
            r2_mode=jnp.array(_R2_DEFERRED, jnp.int32),
            budget_used=jnp.zeros((), jnp.int32),
            converged_at_step=jnp.array(-1, jnp.int32),
            prev_lam=jnp.ones(rank, jnp.float32),
            airm_vel_prev=jnp.array(float("inf"), jnp.float32),
            airm_vel_curr=jnp.array(float("inf"), jnp.float32),
            is_slow_mixing=jnp.zeros((), jnp.bool_),
            chain_collinearity=jnp.array(float("nan"), jnp.float32),
            unimodality_passed=jnp.ones((), jnp.bool_),
            deferred_to_ensemble=jnp.zeros((), jnp.bool_),
            within_lam1=jnp.array(float("nan"), jnp.float32),
            chain_consistency_psi=jnp.array(float("nan"), jnp.float32),
            r1_top=jnp.array(float("nan"), jnp.float32),
            detection_branch=jnp.array(_DETECTION_BRANCH_NONE, jnp.int32),
            unimodality_flag_count=jnp.zeros((), jnp.int32),
        )

    def update(state, positions, grads=None) -> MultiChainMetaAdaptationCoreState:
        slot = state.buffer_idx % state.draws_buffer.shape[1]

        def per_chain(draws_m, grads_m, pos_m, grad_m):
            return (
                _ring_write(draws_m, fu.ravel_pytree(pos_m)[0], slot),
                _ring_write(grads_m, fu.ravel_pytree(grad_m)[0], slot),
            )

        draws, grads_new = jax.vmap(per_chain)(
            state.draws_buffer, state.grads_buffer, positions, grads
        )
        return state._replace(
            draws_buffer=draws,
            grads_buffer=grads_new,
            buffer_idx=state.buffer_idx + 1,
            budget_used=state.budget_used + n_chains,
        )

    def final(state) -> MultiChainMetaAdaptationCoreState:
        M, rows, d = state.draws_buffer.shape
        n = jnp.minimum(state.buffer_idx, jnp.int32(rows))
        rank = state.inverse_mass_matrix.U.shape[1]

        chain_means, W_diag = _compute_within_chain_stats(state.draws_buffer, n)
        grand_mean = chain_means.mean(0)
        sigma_w = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))

        # ---- T-branch raw signals: between-chain spike ------------------
        dof = M - 1
        edge_full = _mc_detection_edge(d, dof)
        T_eigs, V_top, collinearity = _between_chain_detection(
            chain_means, W_diag, n, M, d
        )
        k_detected = (T_eigs > jnp.float32(edge_full)).sum().astype(jnp.int32)
        k_new = jnp.minimum(
            jnp.minimum(k_detected, jnp.int32(max(dof - 1, 1))), jnp.int32(rank)
        )
        spike_dir_raw = sigma_w * V_top[:, 0]
        spike_dir = spike_dir_raw / jnp.maximum(
            jnp.linalg.norm(spike_dir_raw), jnp.float32(1e-10)
        )
        is_unimodal, _ = _unimodality_gap_stat(chain_means, spike_dir, M)
        t_spike = T_eigs[0] > jnp.float32(edge_full)
        t_collinear = collinearity >= jnp.float32(_MC_COLLINEARITY_TOL)
        t_loo = _loo_detection_passes(
            chain_means, W_diag, n, M, d, _mc_detection_edge(d, max(dof - 1, 1))
        )
        t_supported = k_new >= 1
        # the deferred latch below deliberately skips the collinearity gate
        t_core = t_spike & t_loo & t_supported
        t_signal = t_core & t_collinear

        # ---- pooled per-chain-centered buffers --------------------------
        pc_draws, pc_grads, _ = _build_pc_centered_time_major_pool(
            state.draws_buffer, state.grads_buffer, chain_means, n, M
        )
        n_pool = n * jnp.int32(M)
        pool_mask = jnp.repeat(
            (jnp.arange(rows) < n).astype(state.draws_buffer.dtype), M
        )
        pc_draws = jnp.where(jnp.isfinite(pc_draws), pc_draws, 0.0)
        pc_grads = jnp.where(jnp.isfinite(pc_grads), pc_grads, 0.0)

        sigma_lr, mu_lr, U_lr, lam_lr = _compute_low_rank_metric(
            pc_draws, pc_grads, n_pool, rank, gamma, cutoff
        )

        # ---- R^2 curvature gate + projected-tier GAIN router ------------
        _, U_k_pool = _compute_whitened_spectrum(pc_draws, sigma_w, n_pool, rank)
        r2, r2_mode = _compute_r2_score_linearity(
            pc_draws, pc_grads, sigma_w, n_pool, U_k_pool, rank
        )
        r2 = _sanitize_r2(r2)
        # W-branch asks "is the metric fixable?" — the raw per-chain-
        # centered fit answers that; the GAIN override is T-branch routing
        curvature_ok_w = r2 >= _R_MIN

        def routed_r2():
            gain, r2_projected = _compute_projected_gain_r2_mc(
                pc_draws, pc_grads, sigma_w, n, M, U_k_pool
            )
            fires = jnp.isfinite(gain) & (gain > _GAIN_THRESHOLD) & (
                r2_projected >= _R_MIN
            )
            return jnp.where(fires, r2_projected, jnp.array(float("nan"), r2.dtype))

        r2_routing = jax.lax.cond(
            r2_mode == jnp.int32(_R2_PROJECTED), routed_r2, lambda: r2
        )
        curvature_ok = r2_routing >= _R_MIN

        # ---- W-branch: pooled within-chain whiteness --------------------
        lam1_w, w_top_dir = _compute_pooled_within_spectrum(
            state.draws_buffer, chain_means, W_diag, n, M, rank
        )
        psi_w = _compute_chain_consistency_psi(
            state.draws_buffer, chain_means, W_diag, n, M
        )
        r1_w = _compute_lag1_autocorr_top_dir(
            state.draws_buffer, chain_means, W_diag, w_top_dir, n, M
        )
        w_signal = (
            (lam1_w > _w_branch_null_edge(M, n, d))
            & (psi_w > _w_branch_psi_threshold(M, n, d))
            & (r1_w > jnp.float32(_W_BRANCH_R1_TOL))
        )

        deadline_ok = _deadline_gate(
            steps_per_chain, state.budget_used // jnp.int32(n_chains), k_new
        )

        fires_W = ~state.has_escalated & w_signal & curvature_ok_w & deadline_ok

        # ---- T-branch three-way unimodality rule ------------------------
        mode_flag = _compute_mode_consistency_flag(
            pc_draws,
            pc_grads,
            state.grads_buffer,
            chain_means,
            grand_mean,
            V_top,
            sigma_w,
            T_eigs,
            jnp.float32(edge_full),
            n,
            M,
        )
        contraction = _compute_contraction_stat(
            state.draws_buffer, chain_means, grand_mean, n, M
        )
        still_converging = contraction < jnp.float32(-2.365)  # one-sided, alpha=2.5%
        t_unimodality = still_converging | (is_unimodal & ~mode_flag)

        fires_T = (
            ~state.has_escalated & curvature_ok & t_signal & t_unimodality & deadline_ok
        )
        fires = fires_W | fires_T
        escalated = state.has_escalated | fires

        # ---- deferred_to_ensemble (non-monotone, 2-window confirmed) ----
        split_signal = mode_flag | ~is_unimodal
        flag_count = jnp.where(
            split_signal, state.unimodality_flag_count + 1, jnp.int32(0)
        )
        deferred = (
            t_core
            & split_signal
            & (flag_count >= jnp.int32(_MC_UNIMODALITY_CONFIRM_WINDOWS))
            & curvature_ok
            & ~fires_T
        )

        fired_branch = jnp.where(
            fires_W & fires_T,
            jnp.int32(_DETECTION_BRANCH_BOTH),
            jnp.where(
                fires_W,
                jnp.int32(_DETECTION_BRANCH_POOLED_WITHIN),
                jnp.int32(_DETECTION_BRANCH_BETWEEN_MEANS),
            ),
        )
        branch = jnp.where(fires, fired_branch, state.detection_branch)

        # ---- metric deployment ------------------------------------------
        # T escalations deploy a rank-1 slow-direction correction whose
        # scale is the f_disp-cancelling geometric mean; W deploys full LR
        deploy_scale = _geometric_mean_deploy_scale(
            chain_means, pc_grads, pool_mask, grand_mean, spike_dir, n_pool, M
        )
        spike_energy = jnp.maximum(
            (jnp.square(sigma_lr) * jnp.square(spike_dir)).sum(), jnp.float32(1e-20)
        )
        lam_spike = (deploy_scale / spike_energy).astype(sigma_lr.dtype)
        t_imm = LowRankInverseMassMatrix(
            sigma=sigma_lr,
            U=jnp.concatenate(
                [spike_dir[:, None].astype(U_lr.dtype), U_lr[:, 1:]], axis=1
            ),
            lam=jnp.concatenate([lam_spike[None], jnp.ones(rank - 1, sigma_lr.dtype)]),
        )
        w_imm = LowRankInverseMassMatrix(sigma=sigma_lr, U=U_lr, lam=lam_lr)
        via_w = (branch == jnp.int32(_DETECTION_BRANCH_POOLED_WITHIN)) | (
            branch == jnp.int32(_DETECTION_BRANCH_BOTH)
        )
        lr_imm = jax.lax.cond(via_w, lambda: w_imm, lambda: t_imm)

        vel_prev, vel_curr, converged_at = _airm_advance(state, lam_lr, escalated)

        return MultiChainMetaAdaptationCoreState(
            inverse_mass_matrix=_select_imm(escalated, lr_imm, sigma_w, rank),
            mu_star=jnp.where(escalated, mu_lr, jnp.zeros_like(mu_lr)),
            draws_buffer=jnp.zeros_like(state.draws_buffer),
            grads_buffer=jnp.zeros_like(state.grads_buffer),
            buffer_idx=jnp.zeros_like(state.buffer_idx),
            background_split=jnp.zeros_like(state.background_split),
            recompute_counter=jnp.zeros_like(state.recompute_counter),
            has_escalated=escalated,
            escalation_rank=jnp.where(fires, k_new, state.escalation_rank),
            s_gap_prev=state.s_gap_curr,
            s_gap_curr=jnp.array(float("nan"), jnp.float32),
            r2_latest=r2_routing.astype(jnp.float32),
            r2_mode=r2_mode,
            budget_used=state.budget_used,
            converged_at_step=converged_at,
            prev_lam=lam_lr.astype(jnp.float32),
            airm_vel_prev=vel_prev,
            airm_vel_curr=vel_curr,
            is_slow_mixing=jnp.zeros((), jnp.bool_),
            chain_collinearity=collinearity,
            unimodality_passed=is_unimodal,
            deferred_to_ensemble=deferred,
            within_lam1=lam1_w,
            chain_consistency_psi=psi_w,
            r1_top=r1_w,
            detection_branch=branch,
            unimodality_flag_count=flag_count,
        )

    return MetricCore(init=init, update=update, final=final)
