"""Multi-chain detection statistics for the meta-adaptation controller.

Behavioral parity target: ``blackjax/adaptation/meta/_detection.py``
(``_compute_within_chain_stats`` :37, ``_between_chain_detection`` :77 via the
M x M Gram, ``_loo_detection_passes`` :147, ``_unimodality_gap_stat`` :199,
``_compute_pooled_within_spectrum`` :237, ``_compute_mode_consistency_flag``
:316 [R^2_local vs R^2_global per admitted spike direction],
``_compute_contraction_stat`` :481 [split-half drift t],
``_compute_chain_consistency_psi`` :571 [off-diagonal Frobenius cosine of the
two chain-half residual correlations], ``_compute_lag1_autocorr_top_dir``
:669 [oscillation screen]).

TPU notes: everything is Gram-sized (M x M or N x N with N = M*B) or a thin
SVD — never a d x d eigendecomposition; all masks are fixed-shape.
"""
import jax
import jax.numpy as jnp

from blackjax_tpu.adaptation.meta._calibration import _mc_unimodality_threshold
from blackjax_tpu.types import Array


def _compute_within_chain_stats(draws_buffer_mc: Array, n) -> tuple[Array, Array]:
    """Per-chain means ``(M, d)`` and the pooled within-chain diagonal
    variance ``(d,)`` over the first ``n`` valid rows of each chain."""
    M, B, d = draws_buffer_mc.shape
    n_safe = jnp.maximum(n.astype(draws_buffer_mc.dtype), 1.0)
    step_mask = (jnp.arange(B) < n).astype(draws_buffer_mc.dtype)
    chain_means = (step_mask[None, :, None] * draws_buffer_mc).sum(1) / n_safe

    def chain_var(draws_m, mean_m):
        centered = step_mask[:, None] * (draws_m - mean_m[None, :])
        return (centered**2).sum(0) / jnp.maximum(n_safe - 1.0, 1.0)

    return chain_means, jax.vmap(chain_var)(draws_buffer_mc, chain_means).mean(0)


def _between_chain_detection(
    chain_means: Array, W_diag: Array, n, M: int, d: int
) -> tuple[Array, Array, Array]:
    """T-branch statistic via the M x M Gram of whitened chain-mean
    deviations: T = (n/(M-1)) Z Zᵀ's eigenvalues are per-direction B/W
    ratios. Returns ``(T_eigenvalues desc, V_top (d, M-1), f1)`` where f1 is
    the top-direction concentration (collinearity score)."""
    n_f = n.astype(chain_means.dtype)
    grand_mean = chain_means.mean(0)
    sigma_w = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))
    Z = (chain_means - grand_mean[None, :]) / sigma_w[None, :]
    gram = Z @ Z.T
    eigvals, eigvecs = jnp.linalg.eigh(gram)
    eigvals = jnp.flip(eigvals)
    eigvecs = jnp.flip(eigvecs, axis=1)

    T_eigenvalues = eigvals * (n_f / jnp.float32(M - 1))
    f1 = (eigvals[0] / jnp.maximum(jnp.trace(gram), jnp.float32(1e-20))).astype(
        jnp.float32
    )
    top = min(M - 1, d)
    s_safe = jnp.sqrt(jnp.maximum(eigvals[:top], jnp.float32(1e-10)))
    V_top = Z.T @ eigvecs[:, :top] / s_safe[None, :]
    return T_eigenvalues, V_top, f1


def _loo_detection_passes(
    chain_means: Array, W_diag: Array, n, M: int, d: int, edge_loo: float
) -> Array:
    """Leave-one-out robustness: the top T eigenvalue must clear the M-2-dof
    edge after dropping ANY single chain (conjunction over M drops)."""
    n_f = n.astype(chain_means.dtype)
    c_loo = n_f / jnp.float32(M - 2)
    sigma_w = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))
    edge = jnp.float32(edge_loo)

    all_pass = jnp.ones((), jnp.bool_)
    for m_drop in range(M):
        rows = [chain_means[m] for m in range(M) if m != m_drop]
        Z = jnp.stack(rows)
        Z = (Z - Z.mean(0)[None, :]) / sigma_w[None, :]
        top = jnp.linalg.eigvalsh(Z @ Z.T)[-1]
        all_pass = all_pass & (top * c_loo > edge)
    return all_pass


def _unimodality_gap_stat(
    chain_means: Array, top_direction: Array, M: int
) -> tuple[Array, Array]:
    """Gap statistic on the projected chain means: ``max_gap / mean_gap``
    large means the means split into clusters (mode-split flag)."""
    threshold = _mc_unimodality_threshold(M)
    proj = jnp.sort(chain_means @ top_direction)
    gaps = proj[1:] - proj[:-1]
    gap_ratio = gaps.max() / jnp.maximum(gaps.mean(), jnp.float32(1e-10))
    return gap_ratio < jnp.float32(threshold), gap_ratio.astype(jnp.float32)


def _compute_pooled_within_spectrum(
    draws_buffer_mc: Array, chain_means: Array, W_diag: Array, n, M: int, max_rank: int
) -> tuple[Array, Array]:
    """Top eigenpair of the pooled within-chain residual correlation: thin
    SVD of the stacked per-chain-centered diag-whitened residuals with
    M(n-1) dof. Mode-blind by construction (per-chain centering)."""
    _M, B, d = draws_buffer_mc.shape
    sigma_w = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))
    whitened = (draws_buffer_mc - chain_means[:, None, :]) / sigma_w[None, None, :]
    step_mask = (jnp.arange(B) < n).astype(whitened.dtype)
    Y = (step_mask[None, :, None] * whitened).reshape(M * B, d)
    N = jnp.maximum(n.astype(jnp.int32) * M - M, 1).astype(Y.dtype)
    Y = Y / jnp.sqrt(jnp.maximum(N, 1.0))
    Y = jnp.where(jnp.isfinite(Y), Y, jnp.zeros_like(Y))
    _, s, Vt = jnp.linalg.svd(Y, full_matrices=False)
    return (s[0] ** 2).astype(jnp.float32), Vt[0].astype(jnp.float32)


def _compute_mode_consistency_flag(
    pc_draws_tm: Array,
    pc_grads_tm: Array,
    grads_buffer_mc: Array,
    chain_means: Array,
    grand_mean: Array,
    V_top: Array,
    sigma_w_diag: Array,
    T_eigenvalues: Array,
    edge_full,
    n,
    M: int,
) -> Array:
    """Per-direction mode-split signature: for each admitted T-spike
    direction, flag when ``R2_local - R2_global > 0.3`` and ``R2_local >=
    0.5``. R2_global regresses the GRAND-centered RAW score on the
    grand-centered position (a unimodal target's score is globally linear;
    per-chain-centered grads there would false-flag overdispersed unimodal
    starts); R2_local is the per-chain per-chain-centered fit, median over
    chains. True if ANY admitted direction flags."""
    BM, d = pc_draws_tm.shape
    B = BM // M

    step_mask = (jnp.arange(B) < n).astype(grads_buffer_mc.dtype)
    n_f = jnp.maximum(n.astype(grads_buffer_mc.dtype), 1.0)
    total = jnp.maximum(n_f * M, 1.0)
    grand_grad = (step_mask[None, :, None] * grads_buffer_mc).sum((0, 1)) / total
    gc_grads_tm = (grads_buffer_mc - grand_grad[None, None, :]).swapaxes(0, 1).reshape(
        BM, d
    )
    gc_offset_tm = jnp.tile(chain_means - grand_mean[None, :], (B, 1))

    t_idx = jnp.arange(BM, dtype=jnp.int32) // M
    valid = (t_idx < n).astype(pc_draws_tm.dtype)

    def simple_r2(x, s, mask):
        n_m = jnp.maximum(mask.sum(), jnp.float32(2.0))
        x_c = x - (mask * x).sum() / n_m
        s_c = s - (mask * s).sum() / n_m
        beta = (mask * x_c * s_c).sum() / jnp.maximum(
            (mask * x_c**2).sum(), jnp.float32(1e-20)
        )
        rss = (mask * (s_c - beta * x_c) ** 2).sum()
        tot = jnp.maximum((mask * s_c**2).sum(), jnp.float32(1e-20))
        return jnp.clip(1.0 - rss / tot, jnp.float32(-10.0), jnp.float32(1.0))

    def flag_for_direction(j):
        e = sigma_w_diag * V_top[:, j]
        e = e / jnp.maximum(jnp.linalg.norm(e), jnp.float32(1e-10))

        r2_global = simple_r2(
            (pc_draws_tm + gc_offset_tm) @ e, gc_grads_tm @ e, valid
        )
        x_pc = (pc_draws_tm @ e).reshape(B, M)
        s_pc = (pc_grads_tm @ e).reshape(B, M)
        r2_per_chain = jax.vmap(lambda x, s: simple_r2(x, s, step_mask), in_axes=(1, 1))(
            x_pc, s_pc
        )
        r2_local = jnp.median(r2_per_chain)

        admitted = T_eigenvalues[j] > edge_full
        return admitted & (r2_local - r2_global > 0.3) & (r2_local >= 0.5)

    k = V_top.shape[1]
    return jnp.stack([flag_for_direction(j) for j in range(k)]).any()


def _compute_contraction_stat(
    draws_buffer: Array, chain_means: Array, grand_mean: Array, n, M: int
) -> Array:
    """Split-half drift t: each chain's late-minus-early mean along its own
    offset direction, standardized, then a one-sided t over chains. Strongly
    negative = chains converging toward the grand mean (unimodal-safe)."""
    _M, B, d = draws_buffer.shape
    offsets = chain_means - grand_mean[None, :]
    o_hat = offsets / jnp.maximum(
        jnp.linalg.norm(offsets, axis=1, keepdims=True), jnp.float32(1e-10)
    )
    proj = (draws_buffer * o_hat[:, None, :]).sum(-1)  # (M, B)

    step = jnp.arange(B, dtype=jnp.int32)
    n_half = n // 2
    early = (step < n_half).astype(proj.dtype)
    late = ((step >= n_half) & (step < n)).astype(proj.dtype)
    valid = (step < n).astype(proj.dtype)
    n_half_f = jnp.maximum(n_half.astype(jnp.float32), 1.0)
    n_late_f = jnp.maximum((n - n_half).astype(jnp.float32), 1.0)
    n_f = jnp.maximum(n.astype(jnp.float32), 1.0)

    early_m = (proj * early[None, :]).sum(1) / n_half_f
    late_m = (proj * late[None, :]).sum(1) / n_late_f
    mean_all = (proj * valid[None, :]).sum(1) / n_f
    var = (valid[None, :] * (proj - mean_all[:, None]) ** 2).sum(1) / jnp.maximum(
        n_f - 1.0, 1.0
    )
    se = jnp.sqrt(jnp.maximum(var, jnp.float32(1e-10)) * 2.0 / n_half_f)
    c = (late_m - early_m) / jnp.maximum(se, jnp.float32(1e-10))
    t = c.mean() / jnp.maximum(
        jnp.std(c, ddof=1) / jnp.sqrt(jnp.float32(M)), jnp.float32(1e-10)
    )
    return t.astype(jnp.float32)


def _compute_chain_consistency_psi(
    draws_buffer_mc: Array, chain_means: Array, W_diag: Array, n, M: int
) -> Array:
    """Cross-chain consistency Psi: cosine (Frobenius) of the OFF-DIAGONAL
    residual correlations of two fixed chain halves, computed Gram-side
    (never a d x d matrix). Independent-chain noise cancels exactly, so Psi
    carries target structure but is blind to per-chain mixing rate."""
    _M, B, d = draws_buffer_mc.shape
    M_A = M // 2
    sigma_w = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))
    whitened = (draws_buffer_mc - chain_means[:, None, :]) / sigma_w[None, None, :]
    step_mask = (jnp.arange(B) < n).astype(whitened.dtype)
    Y_A = (step_mask[None, :, None] * whitened[:M_A]).reshape(M_A * B, d)
    Y_B = (step_mask[None, :, None] * whitened[M_A:]).reshape((M - M_A) * B, d)
    Y_A = jnp.where(jnp.isfinite(Y_A), Y_A, jnp.zeros_like(Y_A))
    Y_B = jnp.where(jnp.isfinite(Y_B), Y_B, jnp.zeros_like(Y_B))

    # <R_A, R_B>_F via ||Y_A Y_Bᵀ||_F²; subtract the diagonal contribution
    d_A = jnp.sum(Y_A**2, axis=0)
    d_B = jnp.sum(Y_B**2, axis=0)
    inner_C_AB = jnp.sum((Y_A @ Y_B.T) ** 2) - jnp.dot(d_A, d_B)
    inner_C_AA = jnp.sum((Y_A @ Y_A.T) ** 2) - jnp.dot(d_A, d_A)
    inner_C_BB = jnp.sum((Y_B @ Y_B.T) ** 2) - jnp.dot(d_B, d_B)
    psi = inner_C_AB / jnp.maximum(
        jnp.sqrt(jnp.maximum(inner_C_AA * inner_C_BB, jnp.float32(1e-30))),
        jnp.float32(1e-20),
    )
    return psi.astype(jnp.float32)


def _compute_lag1_autocorr_top_dir(
    draws_buffer_mc: Array,
    chain_means: Array,
    W_diag: Array,
    top_eigvec: Array,
    n,
    M: int,
) -> Array:
    """Oscillation screen: pooled lag-1 autocorrelation of the projections
    onto the top W direction (diffusive slow directions are positive;
    integrator resonance alternates negative)."""
    _M, B, d = draws_buffer_mc.shape
    sigma_w = jnp.sqrt(jnp.maximum(W_diag, jnp.float32(1e-20)))
    whitened = (draws_buffer_mc - chain_means[:, None, :]) / sigma_w[None, None, :]
    proj = whitened @ top_eigvec  # (M, B)
    step_mask = (jnp.arange(B) < n).astype(proj.dtype)
    n_f = jnp.maximum(n.astype(proj.dtype), 2.0)

    def chain_lag1(p):
        mu = (step_mask * p).sum() / n_f
        c = step_mask * (p - mu)
        var = (c**2).sum() / jnp.maximum(n_f - 1.0, 1.0)
        cov1 = (c[:-1] * c[1:] * step_mask[:-1] * step_mask[1:]).sum() / jnp.maximum(
            n_f - 2.0, 1.0
        )
        return cov1 / jnp.maximum(var, jnp.float32(1e-20))

    return jax.vmap(chain_lag1)(proj).mean().astype(jnp.float32)
