"""Scan-carry states and the post-run verdict of the meta-adaptation
controller.

Behavioral parity target: ``blackjax/adaptation/meta/_state.py``
(``MetaAdaptationCoreState`` :29, ``MetaAdaptationVerdict`` :62,
``MultiChainMetaAdaptationCoreState`` :90).

The two carry states are declared from shared field groups with the
functional ``NamedTuple`` API, which states the actual protocol directly:

- both begin with the BUFFER HEAD, mirroring ``LowRankMetricCoreState``
  field-for-field so either state can ride the staged warmup engine
  unchanged (the IMM is always a :class:`LowRankInverseMassMatrix`;
  before escalation U=0, lam=1 — the diagonal metric, bit-for-bit);
- both share the CONTROLLER carry (escalation latch, S_gap/R² window
  signals, AIRM-velocity convergence tracking);
- the multi-chain state appends the W/T two-branch detection diagnostics,
  and its buffers are per-chain ``(M, buf, d)`` with one shared metric.
"""
from typing import NamedTuple

from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.types import Array

# Buffer head — mirrors LowRankMetricCoreState. In the multi-chain state the
# two buffers are (M, buf, d); background_split/recompute_counter are
# protocol-compat slots pinned to 0.
_BUFFER_HEAD = [
    ("inverse_mass_matrix", LowRankInverseMassMatrix),
    ("mu_star", Array),
    ("draws_buffer", Array),
    ("grads_buffer", Array),
    ("buffer_idx", Array),
    ("background_split", Array),
    ("recompute_counter", Array),
]

# Controller carry, identical semantics in both states. has_escalated is a
# monotone True-once latch; converged_at_step stays -1 until the AIRM
# velocity criterion first fires; r2_mode codes 0=deferred 1=projected
# 2=full_affine; prev_lam is the (max_rank,) AIRM velocity basis. In the
# multi-chain state s_gap_prev/curr are NaN (diagnostic compat only — the
# cross-chain signal replaces them) and is_slow_mixing is always False.
_CONTROLLER_CARRY = [
    ("has_escalated", Array),
    ("escalation_rank", Array),
    ("s_gap_prev", Array),
    ("s_gap_curr", Array),
    ("r2_latest", Array),
    ("r2_mode", Array),
    ("budget_used", Array),
    ("converged_at_step", Array),
    ("prev_lam", Array),
    ("airm_vel_prev", Array),
    ("airm_vel_curr", Array),
    ("is_slow_mixing", Array),
]

# Multi-chain W/T detection tail: chain_collinearity is f1 from the latest
# window (NaN before the first); within_lam1 / chain_consistency_psi / r1_top
# are the W-branch top eigenvalue, Psi agreement, and lag-1 autocorrelation
# of the top W direction; detection_branch holds the _DETECTION_BRANCH_*
# code; unimodality_flag_count counts consecutive multimodality flags;
# deferred_to_ensemble is the one non-monotone latch.
_MULTICHAIN_TAIL = [
    ("chain_collinearity", Array),
    ("unimodality_passed", Array),
    ("deferred_to_ensemble", Array),
    ("within_lam1", Array),
    ("chain_consistency_psi", Array),
    ("r1_top", Array),
    ("detection_branch", Array),
    ("unimodality_flag_count", Array),
]

MetaAdaptationCoreState = NamedTuple(
    "MetaAdaptationCoreState", _BUFFER_HEAD + _CONTROLLER_CARRY
)
MetaAdaptationCoreState.__doc__ = "Single-chain controller carry."

MultiChainMetaAdaptationCoreState = NamedTuple(
    "MultiChainMetaAdaptationCoreState",
    _BUFFER_HEAD + _CONTROLLER_CARRY + _MULTICHAIN_TAIL,
)
MultiChainMetaAdaptationCoreState.__doc__ = (
    "M-chain controller carry: per-chain buffers (M, buf, d), one shared "
    "metric, and the W/T two-branch detection diagnostics."
)


class MetaAdaptationVerdict(NamedTuple):
    """Python-side verdict extracted after the warmup scan.
    ``budget_returned_steps`` is advisory (the scan runs full length)."""

    route: str  # "diagonal" | "low_rank" | "reparam_suggested"
    metric: LowRankInverseMassMatrix
    effective_rank: int  # deployed |lam-1| > tol count
    confidence: str  # "high" | "low"
    exit_reason: str
    budget_used_steps: int
    budget_returned_steps: int
    budget_used_grads: int  # -1 without an info stream
    r2_final: float
    s_gap_final: float
    transient_mixing_class: str  # "slow" | "fast"
    buffer_policy: str  # always "reset" in v1
    flags: dict
