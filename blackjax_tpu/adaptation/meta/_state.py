"""Scan-carry states and the post-run verdict of the meta-adaptation
controller.

Behavioral parity target: ``blackjax/adaptation/meta/_state.py``
(``MetaAdaptationCoreState`` :29, ``MetaAdaptationVerdict`` :62,
``MultiChainMetaAdaptationCoreState`` :90). The buffer head of each core
state mirrors ``LowRankMetricCoreState`` so the states are interchangeable in
the staged warmup engine; the IMM is always a
:class:`LowRankInverseMassMatrix` (U=0, lam=1 before escalation — the
diagonal metric, bit-for-bit).
"""
from typing import NamedTuple

from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.types import Array


class MetaAdaptationCoreState(NamedTuple):
    """Single-chain controller carry."""

    # buffer head (mirrors LowRankMetricCoreState)
    inverse_mass_matrix: LowRankInverseMassMatrix
    mu_star: Array
    draws_buffer: Array  # (buf, d)
    grads_buffer: Array  # (buf, d)
    buffer_idx: Array
    background_split: Array  # protocol compat; always 0
    recompute_counter: Array  # protocol compat; always 0
    # controller carry
    has_escalated: Array  # monotone True-once
    escalation_rank: Array  # k chosen at escalation
    s_gap_prev: Array
    s_gap_curr: Array
    r2_latest: Array
    r2_mode: Array  # 0=deferred 1=projected 2=full_affine
    budget_used: Array
    converged_at_step: Array  # -1 until the AIRM criterion first fires
    prev_lam: Array  # (max_rank,) — AIRM velocity basis
    airm_vel_prev: Array
    airm_vel_curr: Array
    is_slow_mixing: Array


class MultiChainMetaAdaptationCoreState(NamedTuple):
    """M-chain controller carry: per-chain buffers ``(M, buf, d)``, one
    shared metric, and the W/T two-branch detection diagnostics."""

    inverse_mass_matrix: LowRankInverseMassMatrix
    mu_star: Array
    draws_buffer: Array  # (M, buf, d)
    grads_buffer: Array  # (M, buf, d)
    buffer_idx: Array
    background_split: Array
    recompute_counter: Array
    has_escalated: Array
    escalation_rank: Array
    s_gap_prev: Array  # NaN (diagnostic compat; not the MC signal)
    s_gap_curr: Array
    r2_latest: Array
    r2_mode: Array
    budget_used: Array
    converged_at_step: Array
    prev_lam: Array
    airm_vel_prev: Array
    airm_vel_curr: Array
    is_slow_mixing: Array
    chain_collinearity: Array  # f1 from the latest window (NaN before)
    unimodality_passed: Array
    deferred_to_ensemble: Array  # non-monotone latch
    within_lam1: Array  # W-branch top eigenvalue
    chain_consistency_psi: Array  # W-branch Psi
    r1_top: Array  # lag-1 autocorr of the top W direction
    detection_branch: Array  # _DETECTION_BRANCH_* code
    unimodality_flag_count: Array  # consecutive multimodality flags


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
