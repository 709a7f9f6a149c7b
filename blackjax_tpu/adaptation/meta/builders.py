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


def _clip_r2(r2):
    """Garbage fits (< -10) go to NaN (the deferred path); cap at 1."""
    return jnp.where(
        r2 < -10.0,
        jnp.asarray(float("nan"), r2.dtype),
        jnp.clip(r2, max=1.0),
    )


def _airm_advance(state, lam_lr, new_has_escalated):
    """Shared AIRM-velocity advisory bookkeeping: track the lam change norm
    post-escalation; record the first step where two consecutive windows are
    below tolerance."""
    lam_diff = jnp.linalg.norm(lam_lr - state.prev_lam.astype(lam_lr.dtype)).astype(
        jnp.float32
    )
    vel_prev = state.airm_vel_curr
    vel_curr = jnp.where(new_has_escalated, lam_diff, state.airm_vel_curr)
    converged_now = (
        new_has_escalated
        & (vel_curr < _AIRM_VELOCITY_TOL)
        & (vel_prev < _AIRM_VELOCITY_TOL)
    )
    converged_at = jnp.where(
        (state.converged_at_step < 0) & converged_now,
        state.budget_used,
        state.converged_at_step,
    )
    return vel_prev, vel_curr, converged_at


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
    _max_rank = _MAX_RANK_CAP if max_rank is None else max_rank
    max_budget_steps = max(max_grad_budget // _ASSUMED_AVG_LEAPFROGS_PER_STEP, 1)

    def init(n_dims: int) -> MetaAdaptationCoreState:
        # half-budget ceiling; overflow is safe (RESET keeps the newest rows)
        buf = min(max(max_budget_steps // 2, 256), max_budget_steps)
        buf = max(buf, 2 * (_max_rank + 1) * _MIN_TRAIN_K_RATIO)
        buf = min(buf, max_budget_steps)
        actual_rank = min(_max_rank, max(n_dims // 2, 1), _MAX_RANK_CAP)
        return MetaAdaptationCoreState(
            inverse_mass_matrix=LowRankInverseMassMatrix(
                sigma=jnp.ones(n_dims),
                U=jnp.zeros((n_dims, actual_rank)),
                lam=jnp.ones(actual_rank),
            ),
            mu_star=jnp.zeros(n_dims),
            draws_buffer=jnp.zeros((buf, n_dims)),
            grads_buffer=jnp.zeros((buf, n_dims)),
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
            prev_lam=jnp.ones(actual_rank, jnp.float32),
            airm_vel_prev=jnp.array(float("inf"), jnp.float32),
            airm_vel_curr=jnp.array(float("inf"), jnp.float32),
            is_slow_mixing=jnp.zeros((), jnp.bool_),
        )

    def update(state, position: ArrayLikeTree, grad=None) -> MetaAdaptationCoreState:
        pos_flat, _ = fu.ravel_pytree(position)
        grad_flat, _ = fu.ravel_pytree(grad)
        B = state.draws_buffer.shape[0]
        idx = state.buffer_idx % B
        col0 = jnp.zeros((), idx.dtype)
        return state._replace(
            draws_buffer=jax.lax.dynamic_update_slice(
                state.draws_buffer, pos_flat[None, :], (idx, col0)
            ),
            grads_buffer=jax.lax.dynamic_update_slice(
                state.grads_buffer, grad_flat[None, :], (idx, col0)
            ),
            buffer_idx=state.buffer_idx + 1,
            budget_used=state.budget_used + 1,
        )

    def final(state: MetaAdaptationCoreState) -> MetaAdaptationCoreState:
        B, d = state.draws_buffer.shape
        n = jnp.minimum(state.buffer_idx, jnp.int32(B))
        actual_rank = state.inverse_mass_matrix.U.shape[1]

        # Welford sigma from the window buffer: the stay-diagonal metric AND
        # the whitening basis the S_gap/R^2 anchors were calibrated on
        n_f = n.astype(state.draws_buffer.dtype)
        n_safe = jnp.maximum(n_f, 1.0)
        mask = (jnp.arange(B) < n).astype(state.draws_buffer.dtype)
        mean_x = (mask[:, None] * state.draws_buffer).sum(0) / n_safe
        var_x = (mask[:, None] * (state.draws_buffer - mean_x[None, :]) ** 2).sum(
            0
        ) / jnp.maximum(n_safe - 1.0, 1.0)
        sigma_welford = jnp.sqrt(jnp.maximum(var_x, 1e-10))

        # the escalated candidate: full Fisher low-rank metric
        sigma_lr, mu_star_new, U_lr, lam_lr = _compute_low_rank_metric(
            state.draws_buffer, state.grads_buffer, n, actual_rank, gamma, cutoff
        )

        diag_imm = LowRankInverseMassMatrix(
            sigma=sigma_welford,
            U=jnp.zeros((d, actual_rank), sigma_welford.dtype),
            lam=jnp.ones(actual_rank, sigma_welford.dtype),
        )
        lr_imm = LowRankInverseMassMatrix(sigma=sigma_lr, U=U_lr, lam=lam_lr)

        eigenvalues, U_k = _compute_whitened_spectrum(
            state.draws_buffer, sigma_welford, n, actual_rank
        )
        k_new = _choose_rank(eigenvalues, n, actual_rank, cutoff)
        s_gap_new = _compute_s_gap(eigenvalues, k_new)
        r2_new, mode_new = _compute_r2_score_linearity(
            state.draws_buffer, state.grads_buffer, sigma_welford, n, U_k, actual_rank
        )
        r2_new = _clip_r2(r2_new)
        is_slow = _compute_transient_mixing_signal(state.draws_buffer, sigma_welford, n)

        # the three escalation gates (NaN R^2 fails the comparison -> no gate)
        r2_gate = r2_new >= _R_MIN
        s_gap_prev_valid = ~jnp.isnan(state.s_gap_curr)
        relative_change = jnp.abs(s_gap_new - state.s_gap_curr) / jnp.maximum(
            s_gap_new, 1e-10
        )
        s_gap_gate = (
            (s_gap_new >= _S_MIN)
            & s_gap_prev_valid
            & (relative_change < _S_GAP_STABILITY_TOL)
        )
        budget_remaining = jnp.int32(max_budget_steps) - state.budget_used.astype(
            jnp.int32
        )
        deadline_ok = budget_remaining >= 2 * k_new + jnp.int32(
            _STEP_SIZE_READAPT_BUFFER
        )

        escalate_now = ~state.has_escalated & r2_gate & s_gap_gate & deadline_ok
        new_has_escalated = state.has_escalated | escalate_now
        new_rank = jnp.where(escalate_now, k_new, state.escalation_rank)

        chosen_imm = jax.lax.cond(new_has_escalated, lambda: lr_imm, lambda: diag_imm)
        chosen_mu = jnp.where(new_has_escalated, mu_star_new, jnp.zeros_like(mu_star_new))

        vel_prev, vel_curr, converged_at = _airm_advance(
            state, lam_lr, new_has_escalated
        )

        return MetaAdaptationCoreState(
            inverse_mass_matrix=chosen_imm,
            mu_star=chosen_mu,
            draws_buffer=jnp.zeros_like(state.draws_buffer),
            grads_buffer=jnp.zeros_like(state.grads_buffer),
            buffer_idx=jnp.zeros_like(state.buffer_idx),
            background_split=jnp.zeros_like(state.background_split),
            recompute_counter=jnp.zeros_like(state.recompute_counter),
            has_escalated=new_has_escalated,
            escalation_rank=new_rank,
            s_gap_prev=state.s_gap_curr,
            s_gap_curr=s_gap_new.astype(jnp.float32),
            r2_latest=r2_new.astype(jnp.float32),
            r2_mode=mode_new,
            budget_used=state.budget_used,
            converged_at_step=converged_at,
            prev_lam=lam_lr.astype(jnp.float32),
            airm_vel_prev=vel_prev,
            airm_vel_curr=vel_curr,
            is_slow_mixing=is_slow,
        )

    return MetricCore(init=init, update=update, final=final)


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
    _max_rank = _MAX_RANK_CAP if max_rank is None else max_rank
    max_budget_steps_total = max(max_grad_budget // _ASSUMED_AVG_LEAPFROGS_PER_STEP, 1)
    max_budget_steps_per_chain = max(max_budget_steps_total // n_chains, 1)
    M = n_chains

    def init(n_dims: int) -> MultiChainMetaAdaptationCoreState:
        buf = min(
            max(max_budget_steps_per_chain // 2, 256), max_budget_steps_per_chain
        )
        buf = max(buf, 2 * (_max_rank + 1) * _MIN_TRAIN_K_RATIO)
        buf = min(buf, max_budget_steps_per_chain)
        actual_rank = min(_max_rank, max(n_dims // 2, 1), _MAX_RANK_CAP)
        return MultiChainMetaAdaptationCoreState(
            inverse_mass_matrix=LowRankInverseMassMatrix(
                sigma=jnp.ones(n_dims),
                U=jnp.zeros((n_dims, actual_rank)),
                lam=jnp.ones(actual_rank),
            ),
            mu_star=jnp.zeros(n_dims),
            draws_buffer=jnp.zeros((M, buf, n_dims)),
            grads_buffer=jnp.zeros((M, buf, n_dims)),
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
            prev_lam=jnp.ones(actual_rank, jnp.float32),
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
        B = state.draws_buffer.shape[1]
        idx = state.buffer_idx % B
        col0 = jnp.zeros((), idx.dtype)

        def write_chain(draws_m, grads_m, pos_m, grad_m):
            pos_flat, _ = fu.ravel_pytree(pos_m)
            grad_flat, _ = fu.ravel_pytree(grad_m)
            return (
                jax.lax.dynamic_update_slice(draws_m, pos_flat[None, :], (idx, col0)),
                jax.lax.dynamic_update_slice(grads_m, grad_flat[None, :], (idx, col0)),
            )

        new_draws, new_grads = jax.vmap(write_chain)(
            state.draws_buffer, state.grads_buffer, positions, grads
        )
        return state._replace(
            draws_buffer=new_draws,
            grads_buffer=new_grads,
            buffer_idx=state.buffer_idx + 1,
            budget_used=state.budget_used + M,
        )

    def final(state) -> MultiChainMetaAdaptationCoreState:
        M_stat, B, d = state.draws_buffer.shape
        n = jnp.minimum(state.buffer_idx, jnp.int32(B))
        actual_rank = state.inverse_mass_matrix.U.shape[1]

        chain_means, W_diag = _compute_within_chain_stats(state.draws_buffer, n)
        grand_mean = chain_means.mean(0)
        sigma_w_diag = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))

        # --- T-branch: between-chain spike detection ---------------------
        dof = M_stat - 1
        edge_full = _mc_detection_edge(d, dof)
        edge_loo = _mc_detection_edge(d, max(dof - 1, 1))
        T_eigenvalues, V_top, f1 = _between_chain_detection(
            chain_means, W_diag, n, M_stat, d
        )
        k_raw = (T_eigenvalues > jnp.float32(edge_full)).sum().astype(jnp.int32)
        k_new = jnp.minimum(
            jnp.minimum(k_raw, jnp.int32(max(dof - 1, 1))), jnp.int32(actual_rank)
        )
        t_magnitude = T_eigenvalues[0] > jnp.float32(edge_full)
        t_collinearity = f1 >= jnp.float32(_MC_COLLINEARITY_TOL)
        t_loo = _loo_detection_passes(chain_means, W_diag, n, M_stat, d, edge_loo)
        t_support = k_new >= 1

        e_unnorm = sigma_w_diag * V_top[:, 0]
        e_dir = e_unnorm / jnp.maximum(jnp.linalg.norm(e_unnorm), jnp.float32(1e-10))
        is_unimodal, _ = _unimodality_gap_stat(chain_means, e_dir, M_stat)
        t_pre_uni = t_magnitude & t_collinearity & t_loo & t_support

        # --- pooled per-chain-centered buffers ---------------------------
        pc_draws_tm, pc_grads_tm, _ = _build_pc_centered_time_major_pool(
            state.draws_buffer, state.grads_buffer, chain_means, n, M_stat
        )
        n_pool = n * jnp.int32(M_stat)
        step_mask_all = jnp.repeat(
            (jnp.arange(B) < n).astype(state.draws_buffer.dtype), M_stat
        )
        pc_draws_safe = jnp.where(
            jnp.isfinite(pc_draws_tm), pc_draws_tm, jnp.zeros_like(pc_draws_tm)
        )
        pc_grads_safe = jnp.where(
            jnp.isfinite(pc_grads_tm), pc_grads_tm, jnp.zeros_like(pc_grads_tm)
        )

        sigma_lr, mu_star_new, U_lr, lam_lr = _compute_low_rank_metric(
            pc_draws_safe, pc_grads_safe, n_pool, actual_rank, gamma, cutoff
        )

        # --- R^2 curvature gate + projected-tier GAIN router --------------
        _, U_k_pooled = _compute_whitened_spectrum(
            pc_draws_safe, sigma_w_diag, n_pool, actual_rank
        )
        r2_new, mode_new = _compute_r2_score_linearity(
            pc_draws_safe, pc_grads_safe, sigma_w_diag, n_pool, U_k_pooled, actual_rank
        )
        r2_new = _clip_r2(r2_new)
        # the W-branch asks "is the metric fixable?" — the raw per-chain-
        # centered fit answers that; the GAIN override is T-branch routing
        r2_gate_w = r2_new >= _R_MIN

        def gain_override():
            gain, r2_pc = _compute_projected_gain_r2_mc(
                pc_draws_safe, pc_grads_safe, sigma_w_diag, n, M_stat, U_k_pooled
            )
            signal = (
                jnp.isfinite(gain) & (gain > _GAIN_THRESHOLD) & (r2_pc >= _R_MIN)
            )
            return jnp.where(signal, r2_pc, jnp.array(float("nan"), r2_new.dtype))

        r2_routing = jax.lax.cond(
            mode_new == jnp.int32(_R2_PROJECTED), gain_override, lambda: r2_new
        )
        r2_gate = r2_routing >= _R_MIN

        # --- W-branch: pooled within-chain whiteness ---------------------
        lam1_w, top_eigvec_w = _compute_pooled_within_spectrum(
            state.draws_buffer, chain_means, W_diag, n, M_stat, actual_rank
        )
        w_magnitude = lam1_w > _w_branch_null_edge(M_stat, n, d)
        psi_w = _compute_chain_consistency_psi(
            state.draws_buffer, chain_means, W_diag, n, M_stat
        )
        w_psi_gate = psi_w > _w_branch_psi_threshold(M_stat, n, d)
        r1_w = _compute_lag1_autocorr_top_dir(
            state.draws_buffer, chain_means, W_diag, top_eigvec_w, n, M_stat
        )
        w_r1_gate = r1_w > jnp.float32(_W_BRANCH_R1_TOL)

        budget_remaining = jnp.int32(max_budget_steps_per_chain) - (
            state.budget_used.astype(jnp.int32) // jnp.int32(n_chains)
        )
        deadline_ok = budget_remaining >= 2 * k_new + jnp.int32(
            _STEP_SIZE_READAPT_BUFFER
        )

        escalate_W = (
            ~state.has_escalated
            & w_magnitude
            & w_psi_gate
            & w_r1_gate
            & r2_gate_w
            & deadline_ok
        )

        # --- T-branch three-way unimodality rule --------------------------
        any_mode_flag = _compute_mode_consistency_flag(
            pc_draws_safe,
            pc_grads_safe,
            state.grads_buffer,
            chain_means,
            grand_mean,
            V_top,
            sigma_w_diag,
            T_eigenvalues,
            jnp.float32(edge_full),
            n,
            M_stat,
        )
        t_contr = _compute_contraction_stat(
            state.draws_buffer, chain_means, grand_mean, n, M_stat
        )
        is_converging = t_contr < jnp.float32(-2.365)  # one-sided, alpha=2.5%
        t_unimodality = is_converging | (is_unimodal & ~any_mode_flag)

        escalate_T = (
            ~state.has_escalated & r2_gate & t_pre_uni & t_unimodality & deadline_ok
        )
        escalate_now = escalate_W | escalate_T
        new_has_escalated = state.has_escalated | escalate_now

        # --- deferred_to_ensemble (non-monotone, 2-window confirmed) ------
        multimodality_signal = any_mode_flag | ~is_unimodal
        new_flag_count = jnp.where(
            multimodality_signal, state.unimodality_flag_count + 1, jnp.int32(0)
        )
        confirmed_split = new_flag_count >= jnp.int32(
            _MC_UNIMODALITY_CONFIRM_WINDOWS
        )
        new_deferred = (
            t_magnitude
            & t_loo
            & t_support
            & multimodality_signal
            & confirmed_split
            & r2_gate
            & ~escalate_T
        )
        new_rank = jnp.where(escalate_now, k_new, state.escalation_rank)

        branch_when_fires = jnp.where(
            escalate_W & escalate_T,
            jnp.int32(_DETECTION_BRANCH_BOTH),
            jnp.where(
                escalate_W,
                jnp.int32(_DETECTION_BRANCH_POOLED_WITHIN),
                jnp.int32(_DETECTION_BRANCH_BETWEEN_MEANS),
            ),
        )
        new_branch = jnp.where(escalate_now, branch_when_fires, state.detection_branch)

        # --- metric selection ---------------------------------------------
        # T escalations deploy a rank-1 slow-direction correction whose scale
        # is the f_disp-cancelling geometric mean; W deploys the full LR
        sigma_sq_deploy = _geometric_mean_deploy_scale(
            chain_means, pc_grads_safe, step_mask_all, grand_mean, e_dir, n_pool, M_stat
        )
        sigma_lr_e_sq = jnp.maximum(
            ((sigma_lr**2) * (e_dir**2)).sum(), jnp.float32(1e-20)
        )
        lam_slow = (sigma_sq_deploy / sigma_lr_e_sq).astype(sigma_lr.dtype)
        t_lr_imm = LowRankInverseMassMatrix(
            sigma=sigma_lr,
            U=jnp.concatenate([e_dir[:, None].astype(U_lr.dtype), U_lr[:, 1:]], axis=1),
            lam=jnp.concatenate(
                [lam_slow[None], jnp.ones(actual_rank - 1, sigma_lr.dtype)]
            ),
        )
        w_lr_imm = LowRankInverseMassMatrix(sigma=sigma_lr, U=U_lr, lam=lam_lr)
        diag_imm = LowRankInverseMassMatrix(
            sigma=sigma_w_diag,
            U=jnp.zeros((d, actual_rank), sigma_w_diag.dtype),
            lam=jnp.ones(actual_rank, sigma_w_diag.dtype),
        )
        prev_was_w = (new_branch == jnp.int32(_DETECTION_BRANCH_POOLED_WITHIN)) | (
            new_branch == jnp.int32(_DETECTION_BRANCH_BOTH)
        )
        escalated_imm = jax.lax.cond(prev_was_w, lambda: w_lr_imm, lambda: t_lr_imm)
        chosen_imm = jax.lax.cond(
            new_has_escalated, lambda: escalated_imm, lambda: diag_imm
        )
        chosen_mu = jnp.where(
            new_has_escalated, mu_star_new, jnp.zeros_like(mu_star_new)
        )

        vel_prev, vel_curr, converged_at = _airm_advance(
            state, lam_lr, new_has_escalated
        )

        return MultiChainMetaAdaptationCoreState(
            inverse_mass_matrix=chosen_imm,
            mu_star=chosen_mu,
            draws_buffer=jnp.zeros_like(state.draws_buffer),
            grads_buffer=jnp.zeros_like(state.grads_buffer),
            buffer_idx=jnp.zeros_like(state.buffer_idx),
            background_split=jnp.zeros_like(state.background_split),
            recompute_counter=jnp.zeros_like(state.recompute_counter),
            has_escalated=new_has_escalated,
            escalation_rank=new_rank,
            s_gap_prev=state.s_gap_curr,
            s_gap_curr=jnp.array(float("nan"), jnp.float32),
            r2_latest=r2_routing.astype(jnp.float32),
            r2_mode=mode_new,
            budget_used=state.budget_used,
            converged_at_step=converged_at,
            prev_lam=lam_lr.astype(jnp.float32),
            airm_vel_prev=vel_prev,
            airm_vel_curr=vel_curr,
            is_slow_mixing=jnp.zeros((), jnp.bool_),
            chain_collinearity=f1,
            unimodality_passed=is_unimodal,
            deferred_to_ensemble=new_deferred,
            within_lam1=lam1_w,
            chain_consistency_psi=psi_w,
            r1_top=r1_w,
            detection_branch=new_branch,
            unimodality_flag_count=new_flag_count,
        )

    return MetricCore(init=init, update=update, final=final)
