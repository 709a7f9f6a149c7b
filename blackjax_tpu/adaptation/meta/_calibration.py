"""Calibration surface of the meta-adaptation controller: every threshold
constant and the four swappable edge/threshold functions live here.

Behavioral parity target: ``blackjax/adaptation/meta/_calibration.py``
(constants :51-204, ``_mc_detection_edge`` :218, ``_mc_unimodality_threshold``
:230, ``_w_branch_null_edge`` :258, ``_w_branch_psi_threshold`` :314). The
numeric values are empirical calibration anchors from the reference's
measurement campaign, not user knobs.
"""
import jax.numpy as jnp

# --- escalation gates ------------------------------------------------------
_R_MIN: float = 0.5  # R^2 curvature gate: funnel ~0.007, metric-fixable >=0.54
_S_MIN: float = 2.0  # S_gap magnitude gate (stoch_vol ~1.5 must not escalate)
_S_GAP_STABILITY_TOL: float = 0.3  # max relative S_gap drift between windows
_MIN_TRAIN_D_RATIO: int = 8  # full-affine fit needs n_half >= 8 d
_MIN_TRAIN_K_RATIO: int = 4  # projected fit needs n_half >= 4 (k+1)
_AIRM_VELOCITY_TOL: float = 0.05  # lam-change norm for the advisory early exit
_STEP_SIZE_READAPT_BUFFER: int = 50  # steps reserved after an escalation
_ASSUMED_AVG_LEAPFROGS_PER_STEP: int = 20  # conservative grads -> steps divisor
_TRANSIENT_MIXING_THRESHOLD: float = 1.0  # split-half mean-diff slow-mix gate
_MAX_RANK_CAP: int = 50  # static buffer-allocation rank cap
_LAM_NONTRIVIAL_TOL: float = 1e-6  # |lam-1| below this counts as no correction

# --- multi-chain gates -----------------------------------------------------
_MULTI_CHAIN_DEFAULT_N_CHAINS: int = 8
_MC_MIN_CHAINS: int = 6  # below this the collinearity null-margin is unsafe
_MC_COLLINEARITY_TOL: float = 0.7  # f1 concentration for a genuine slow dir
_MC_UNIMODALITY_GAP_FRACTION: float = 0.5  # fallback gap-stat fraction
_W_BRANCH_PSI_FLOOR: float = 0.15  # Psi consistency floor (null q999 <= 0.095)
_W_BRANCH_R1_TOL: float = -0.2  # lag-1 lower bound (oscillation screen)
_W_BRANCH_NULL_EDGE_TW_FACTOR: float = 1.02  # finite-N Tracy-Widom inflation

# gap-stat null q99 per chain count (measured at M=8; conservative below)
_MC_UNIMODALITY_Q99_TABLE: dict = {6: 3.8, 7: 4.2, 8: 4.54}
_MC_UNIMODALITY_CONFIRM_WINDOWS: int = 2  # consecutive flags before deferring

# detection branch codes
_DETECTION_BRANCH_NONE: int = 0
_DETECTION_BRANCH_POOLED_WITHIN: int = 1  # W-branch fired
_DETECTION_BRANCH_BETWEEN_MEANS: int = 2  # T-branch fired
_DETECTION_BRANCH_BOTH: int = 3

# R^2 mode codes
_R2_DEFERRED: int = 0
_R2_PROJECTED: int = 1
_R2_FULL_AFFINE: int = 2

# projected-tier GAIN router
_GAIN_THRESHOLD: float = 0.3  # per-chain fit must beat shared fit by this
_GAIN_READABILITY_FLOOR: float = 0.5  # below this the fits are unreadable


def _mc_detection_edge(d: int, dof: int) -> float:
    """Marchenko-Pastur bulk edge ``(1 + sqrt(d/dof))^2`` for the between-chain
    T spectrum (dof = M-1: the grand-mean constraint removes one)."""
    return (1.0 + (d / dof) ** 0.5) ** 2


def _mc_unimodality_threshold(M: int) -> float:
    """Gap-stat threshold at the null q99 (table for calibrated M, the
    conservative ``max(0.5 (M-1), 3)`` formula otherwise)."""
    return _MC_UNIMODALITY_Q99_TABLE.get(
        M, max(_MC_UNIMODALITY_GAP_FRACTION * (M - 1), 3.0)
    )


def _w_branch_null_edge(M: int, n, d: int):
    """Null bulk upper edge of the pooled within-chain residual spectrum:
    ``1.02 (1 + sqrt(d / (M (n-1))))^2``. A necessary magnitude screen only —
    the Psi consistency gate is the load-bearing false-positive control."""
    N = jnp.maximum(
        jnp.float32(M) * (jnp.asarray(n, jnp.float32) - 1.0), jnp.float32(1.0)
    )
    return jnp.float32(_W_BRANCH_NULL_EDGE_TW_FACTOR) * (
        1.0 + jnp.sqrt(jnp.float32(d) / N)
    ) ** 2


def _w_branch_psi_threshold(M: int, n, d: int):
    """Adaptive Psi gate ``max(3 q99_null(M, n, d), 0.15)``: the flat floor
    leaks ~17% at d=10, so the measured q99 anchors (d = 10/26/50 at pooled
    N = 1360) are log-log interpolated over d and scaled by sqrt(N_base/N)."""
    cal_d = jnp.array([10.0, 26.0, 50.0], jnp.float32)
    cal_q = jnp.array([0.129, 0.040, 0.023], jnp.float32)
    n_base = jnp.float32(1360.0)

    N = jnp.float32(M) * jnp.maximum(
        jnp.asarray(n, jnp.float32) - 1.0, jnp.float32(1.0)
    )
    log_d = jnp.log(jnp.maximum(jnp.float32(d), 1.0))
    log_cd = jnp.log(cal_d)
    log_cq = jnp.log(jnp.maximum(cal_q, 1e-6))
    t01 = jnp.clip((log_d - log_cd[0]) / (log_cd[1] - log_cd[0]), 0.0, 1.0)
    t12 = jnp.clip((log_d - log_cd[1]) / (log_cd[2] - log_cd[1]), 0.0, 1.0)
    log_q = jnp.where(
        jnp.float32(d) <= cal_d[1],
        log_cq[0] + t01 * (log_cq[1] - log_cq[0]),
        log_cq[1] + t12 * (log_cq[2] - log_cq[1]),
    )
    q99 = jnp.exp(log_q) * jnp.sqrt(
        jnp.maximum(n_base / jnp.maximum(N, 1.0), jnp.float32(0.01))
    )
    return jnp.maximum(3.0 * q99, jnp.float32(_W_BRANCH_PSI_FLOOR))
