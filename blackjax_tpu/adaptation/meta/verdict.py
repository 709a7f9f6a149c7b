"""Post-run verdict extraction for the meta-adaptation controller.

Behavioral parity target: ``blackjax/adaptation/meta/verdict.py``
(``extract_meta_verdict`` :48, ``extract_multi_chain_verdict`` :166): pure
Python-side readers of the final core state — route / confidence / exit
reason / budget accounting / diagnostics flags.
"""
import numpy as np

from blackjax_tpu.adaptation.meta._calibration import (
    _AIRM_VELOCITY_TOL,
    _DETECTION_BRANCH_BETWEEN_MEANS,
    _DETECTION_BRANCH_BOTH,
    _DETECTION_BRANCH_NONE,
    _DETECTION_BRANCH_POOLED_WITHIN,
    _LAM_NONTRIVIAL_TOL,
    _MC_COLLINEARITY_TOL,
    _R2_DEFERRED,
    _R2_FULL_AFFINE,
    _R2_PROJECTED,
    _R_MIN,
    _S_MIN,
)
from blackjax_tpu.adaptation.meta._state import (
    MetaAdaptationCoreState,
    MetaAdaptationVerdict,
    MultiChainMetaAdaptationCoreState,
)

__all__ = ["extract_meta_verdict", "extract_multi_chain_verdict"]

_R2_MODE_NAMES = {
    _R2_DEFERRED: "deferred",
    _R2_PROJECTED: "projected",
    _R2_FULL_AFFINE: "full_affine",
}
_BRANCH_NAMES = {
    _DETECTION_BRANCH_NONE: "none",
    _DETECTION_BRANCH_POOLED_WITHIN: "pooled_within",
    _DETECTION_BRANCH_BETWEEN_MEANS: "between_means",
    _DETECTION_BRANCH_BOTH: "both",
}


def _common_scalars(final_state):
    return dict(
        has_esc=bool(np.asarray(final_state.has_escalated)),
        nominal_rank=int(np.asarray(final_state.escalation_rank)),
        budget_used=int(np.asarray(final_state.budget_used)),
        s_gap=float(np.asarray(final_state.s_gap_curr)),
        r2=float(np.asarray(final_state.r2_latest)),
        mode_int=int(np.asarray(final_state.r2_mode)),
        airm_prev=float(np.asarray(final_state.airm_vel_prev)),
        airm_curr=float(np.asarray(final_state.airm_vel_curr)),
        converged_at=int(np.asarray(final_state.converged_at_step)),
        is_slow=bool(np.asarray(final_state.is_slow_mixing)),
        effective_rank=int(
            np.sum(
                np.abs(np.asarray(final_state.inverse_mass_matrix.lam) - 1.0)
                > _LAM_NONTRIVIAL_TOL
            )
        ),
    )


def _route_of(has_esc: bool, r2: float) -> str:
    r2_blocked = (not np.isnan(r2)) and (r2 < _R_MIN)
    if not has_esc and r2_blocked:
        return "reparam_suggested"
    return "low_rank" if has_esc else "diagonal"


def _exit_and_budget(c, num_warmup_steps):
    airm_converged = (c["airm_prev"] < _AIRM_VELOCITY_TOL) and (
        c["airm_curr"] < _AIRM_VELOCITY_TOL
    )
    if airm_converged and c["has_esc"]:
        exit_reason = "airm_velocity_converged"
    elif c["budget_used"] >= num_warmup_steps:
        exit_reason = "warmup_budget_exhausted"
    else:
        exit_reason = "warmup_complete"
    returned = (
        max(num_warmup_steps - c["converged_at"], 0) if c["converged_at"] >= 0 else 0
    )
    return exit_reason, returned


def _grads_of(adaptation_info):
    if adaptation_info is None:
        return -1
    try:
        return int(np.asarray(adaptation_info.num_integration_steps).sum())
    except AttributeError:
        return -1


def extract_meta_verdict(
    final_state: MetaAdaptationCoreState,
    max_grad_budget: int,
    num_warmup_steps: int,
    adaptation_info=None,
) -> MetaAdaptationVerdict:
    """Single-chain verdict. ``budget_returned_steps`` is advisory (v1 runs
    the full scan; it records where an AIRM stopping host would have cut)."""
    c = _common_scalars(final_state)
    route = _route_of(c["has_esc"], c["r2"])
    s_gap_valid = not np.isnan(c["s_gap"])
    confidence = (
        "high"
        if (
            c["has_esc"]
            and not np.isnan(c["r2"])
            and c["r2"] >= _R_MIN
            and s_gap_valid
            and c["s_gap"] >= _S_MIN
        )
        else "low"
    )
    exit_reason, returned = _exit_and_budget(c, num_warmup_steps)
    flags = {
        "reparam_hint": route == "reparam_suggested",
        "marginal_s_gap": (not c["has_esc"])
        and s_gap_valid
        and (_S_MIN <= c["s_gap"] < 2.0 * _S_MIN),
        "wall_cost_discount": c["nominal_rank"] > 0,
        "high_d_r2_mode": _R2_MODE_NAMES.get(c["mode_int"], "deferred"),
        "mode_coverage": "single_chain_uncertified",
        "nominal_rank": c["nominal_rank"],
    }
    return MetaAdaptationVerdict(
        route=route,
        metric=final_state.inverse_mass_matrix,
        effective_rank=c["effective_rank"],
        confidence=confidence,
        exit_reason=exit_reason,
        budget_used_steps=c["budget_used"],
        budget_returned_steps=returned,
        budget_used_grads=_grads_of(adaptation_info),
        r2_final=c["r2"],
        s_gap_final=c["s_gap"],
        transient_mixing_class="slow" if c["is_slow"] else "fast",
        buffer_policy="reset",
        flags=flags,
    )


def extract_multi_chain_verdict(
    final_state: MultiChainMetaAdaptationCoreState,
    max_grad_budget: int,
    num_warmup_steps: int,
    adaptation_info=None,
    *,
    pooled_draws_by_window=None,
) -> MetaAdaptationVerdict:
    """Multi-chain verdict: confidence is gated on the collinearity score
    (not S_gap stability); adds W/T branch diagnostics and the
    ``deferred_to_ensemble`` handoff flag."""
    c = _common_scalars(final_state)
    collinearity = float(np.asarray(final_state.chain_collinearity))
    unimodal = bool(np.asarray(final_state.unimodality_passed))
    deferred = bool(np.asarray(final_state.deferred_to_ensemble))
    # the default trace-slimming info fn strips the buffers; tolerate that
    n_chains = (
        final_state.draws_buffer.shape[0]
        if final_state.draws_buffer is not None
        else -1
    )

    route = _route_of(c["has_esc"], c["r2"])
    collinearity_passed = (not np.isnan(collinearity)) and (
        collinearity >= _MC_COLLINEARITY_TOL
    )
    confidence = (
        "high"
        if (
            c["has_esc"]
            and not np.isnan(c["r2"])
            and c["r2"] >= _R_MIN
            and collinearity_passed
        )
        else "low"
    )
    exit_reason, returned = _exit_and_budget(c, num_warmup_steps)

    flags = {
        "reparam_hint": route == "reparam_suggested",
        "marginal_s_gap": False,
        "wall_cost_discount": c["nominal_rank"] > 0,
        "high_d_r2_mode": _R2_MODE_NAMES.get(c["mode_int"], "deferred"),
        "mode_coverage": (
            "multi_chain_certified"
            if (c["has_esc"] and collinearity_passed)
            else "multi_chain_uncertified"
            if n_chains > 1
            else "single_chain_uncertified"
        ),
        "nominal_rank": c["nominal_rank"],
        "n_chains": n_chains,
        "chain_collinearity": collinearity,
        "need_more_chains": (not c["has_esc"])
        and (c["nominal_rank"] > 0)
        and (not collinearity_passed),
        "start_dispersion_adequacy": (
            "adequate_if_overdispersed" if not c["has_esc"] else "not_applicable"
        ),
        "unimodality_gate": "pass" if unimodal else "flag",
        "deferred_to_ensemble": deferred,
        "pooled_draws_by_window": pooled_draws_by_window,
        "within_lam1": float(np.asarray(final_state.within_lam1)),
        "chain_consistency_psi": float(
            np.asarray(final_state.chain_consistency_psi)
        ),
        "r1_top": float(np.asarray(final_state.r1_top)),
        "detection_branch": _BRANCH_NAMES.get(
            int(np.asarray(final_state.detection_branch)), "unknown"
        ),
    }
    return MetaAdaptationVerdict(
        route=route,
        metric=final_state.inverse_mass_matrix,
        effective_rank=c["effective_rank"],
        confidence=confidence,
        exit_reason=exit_reason,
        budget_used_steps=c["budget_used"],
        budget_returned_steps=returned,
        budget_used_grads=_grads_of(adaptation_info),
        r2_final=c["r2"],
        s_gap_final=c["s_gap"],
        transient_mixing_class="slow" if c["is_slow"] else "fast",
        buffer_policy="reset",
        flags=flags,
    )
