"""Meta-adaptation controller: auto-escalation from the diagonal metric to
the Fisher low-rank metric at window boundaries.

Behavioral parity target: ``blackjax/adaptation/meta/__init__.py`` (:14-60).

Signals: (1) held-out score-linearity R^2 — the curvature gate (funnel-class
targets score near 0, every metric-fixable class >= ~0.54); (2) S_gap(k) =
lam_1 / lam_{k+1} of the diagonal-whitened residual — the magnitude
predictor. Escalate diagonal -> rank-k iff R^2 >= 0.5 AND S_gap >= 2, stable
over two consecutive windows, with budget to spare. The multi-chain core
replaces the stability check with pooled W-branch/T-branch detection.

.. warning::
   ``metric="auto"`` is experimental: near the detection boundary the
   single-chain escalation decision can be seed-dependent (the multi-chain
   trigger is the robust variant). Prefer x64 — the composed estimator is
   f32-fragile.

Use via ``staged_adaptation(algorithm, logdensity_fn, metric="auto",
max_grad_budget=50_000)`` and read the decision afterwards with
:func:`extract_meta_verdict` / :func:`extract_multi_chain_verdict`.
"""
from blackjax_tpu.adaptation.meta import _calibration, _detection, _state
from blackjax_tpu.adaptation.meta import builders as _builders
from blackjax_tpu.adaptation.meta import verdict as _verdict

# Public controller surface.
MetaAdaptationCoreState = _state.MetaAdaptationCoreState
MetaAdaptationVerdict = _state.MetaAdaptationVerdict
MultiChainMetaAdaptationCoreState = _state.MultiChainMetaAdaptationCoreState
build_meta_adaptation_core = _builders.build_meta_adaptation_core
build_multi_chain_meta_core = _builders.build_multi_chain_meta_core
extract_meta_verdict = _verdict.extract_meta_verdict
extract_multi_chain_verdict = _verdict.extract_multi_chain_verdict

# Calibration/detection internals re-exported for the test suite and for
# downstream tools that tune the decision thresholds.
_mc_detection_edge = _calibration._mc_detection_edge
_mc_unimodality_threshold = _calibration._mc_unimodality_threshold
_between_chain_detection = _detection._between_chain_detection
_compute_within_chain_stats = _detection._compute_within_chain_stats

__all__ = [
    "MetaAdaptationCoreState",
    "MetaAdaptationVerdict",
    "MultiChainMetaAdaptationCoreState",
    "build_meta_adaptation_core",
    "build_multi_chain_meta_core",
    "extract_meta_verdict",
    "extract_multi_chain_verdict",
]
