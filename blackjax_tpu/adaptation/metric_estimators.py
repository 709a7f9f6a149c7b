"""Pure metric estimators: map draws / gradients / moment blocks to
(inverse-)mass-matrix payloads.

Behavioral parity target: ``blackjax/adaptation/metric_estimators.py``
(Fisher-divergence low-rank :311 [nutpie Algorithm 1,
Seyboldt et al.], draws-SVD low-rank :468, sample-covariance eigh low-rank
:543, shared masked-buffer core :618, Welford wrappers :816/:855, Fisher
diagonal :886/:957, informativeness :164, AIRM geometric mean :102).

Numerical notes carried over from the reference's float32 audit:
- eigen-spectra are floored *relative to their own scale* (an absolute eps
  floor corrupts legitimately-small well-conditioned spectra);
- the Fisher low-rank pipeline promotes to f64 internally when x64 is
  enabled (condition numbers reach ~1/gamma), casting back on return.
"""
from typing import Literal, Optional, Union

import jax
import jax.numpy as jnp

from blackjax_tpu.adaptation.mass_matrix import welford_algorithm
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.types import Array

__all__ = [
    "eigenvalue_informativeness",
    "select_top_eigenvalues_by_informativeness",
    "fisher_score_low_rank",
    "draws_singular_value_low_rank",
    "sample_covariance_eigh_low_rank",
    "welford_diagonal",
    "welford_dense",
    "fisher_score_diagonal_from_moments",
    "fisher_score_diagonal",
    "sample_variance_diagonal",
]


def _relative_pd_floor(vals: Array) -> Array:
    """eps floor scaled to the spectrum's own magnitude (an absolute floor
    would clamp legitimately-small well-conditioned eigenvalues)."""
    scale = jnp.maximum(jnp.max(jnp.abs(vals)), jnp.finfo(vals.dtype).tiny)
    return jnp.finfo(vals.dtype).eps * scale


def _spd_mean(A: Array, B: Array) -> Array:
    """AIRM geometric mean ``A # B = B^{1/2}(B^{-1/2} A B^{-1/2})^{1/2}
    B^{1/2}`` with relative PD floors on both intermediate spectra."""
    vals_b, vecs_b = jnp.linalg.eigh(B)
    vals_b = jnp.maximum(vals_b, _relative_pd_floor(vals_b))
    sqrt_b = jnp.sqrt(vals_b)
    inv_sqrt_b = 1.0 / sqrt_b

    inner = vecs_b.T @ A @ vecs_b
    M = inv_sqrt_b[:, None] * inner * inv_sqrt_b[None, :]
    vals_m, vecs_m = jnp.linalg.eigh(M)
    vals_m = jnp.maximum(vals_m, _relative_pd_floor(vals_m))

    W = vecs_b @ (sqrt_b[:, None] * vecs_m)
    return (W * jnp.sqrt(vals_m)[None, :]) @ W.T


def eigenvalue_informativeness(eigenvalues: Array) -> Array:
    """``|lambda - 1|``: how far each direction deviates from isotropic."""
    return jnp.abs(eigenvalues - 1.0)


def select_top_eigenvalues_by_informativeness(
    eigenvalues: Array,
    eigenvectors: Array,
    max_rank: int,
    *,
    tail_handling: Literal["mask_pad", "raw"] = "mask_pad",
    cutoff: float = 2.0,
) -> tuple[Array, Array]:
    """Pick the ``max_rank`` most informative eigenpairs.

    ``"mask_pad"`` (Fisher consumer): eigenvalues inside
    ``[1/cutoff, cutoff]`` are masked to 1 (no preconditioning benefit), and
    the output is zero-padded to ``max_rank`` when fewer eigenvectors exist.
    ``"raw"`` (SVD/eigh consumers): top-k as-is, no masking or padding.
    """
    if tail_handling not in ("mask_pad", "raw"):
        raise ValueError(
            f"tail_handling must be 'mask_pad' or 'raw', got {tail_handling!r}"
        )
    q = eigenvalues.shape[0]
    scores = eigenvalue_informativeness(eigenvalues)

    if tail_handling == "mask_pad":
        order = jnp.argsort(-scores)
        actual_rank = min(max_rank, q)
        top = order[:actual_rank]
        U_out = eigenvectors[:, top]
        lam_raw = eigenvalues[top]
        is_informative = (lam_raw < 1.0 / cutoff) | (lam_raw > cutoff)
        lam_out = jnp.where(is_informative, lam_raw, 1.0)
        if actual_rank < max_rank:
            d = eigenvectors.shape[0]
            pad = max_rank - actual_rank
            U_out = jnp.concatenate([U_out, jnp.zeros((d, pad))], axis=1)
            lam_out = jnp.concatenate([lam_out, jnp.ones(pad)])
        return U_out, lam_out

    order = jnp.argsort(scores)[::-1]
    actual_rank = min(max_rank, q)
    top = order[:actual_rank]
    U_out = eigenvectors[:, top]
    lam_out = eigenvalues[top]
    if actual_rank < max_rank:
        # fewer eigenpairs exist than the payload's static rank: pad with
        # inert pairs (zero vectors contribute nothing; lam=1 is the
        # identity eigenvalue) so consumers carrying a (d, max_rank)
        # payload through scan/cond keep static shapes
        d = eigenvectors.shape[0]
        pad = max_rank - actual_rank
        U_out = jnp.concatenate([U_out, jnp.zeros((d, pad), U_out.dtype)], axis=1)
        lam_out = jnp.concatenate([lam_out, jnp.ones(pad, lam_out.dtype)])
    return U_out, lam_out


def _compute_low_rank_metric(
    draws_buffer: Array,
    grads_buffer: Array,
    n,
    max_rank: int,
    gamma: float,
    cutoff: float,
):
    """Masked-buffer core of the Fisher-divergence low-rank estimator
    (nutpie Algorithm 1 steps 1-9). ``n`` may be a traced count of valid
    leading rows; everything is computed with row masks so shapes stay
    static under scan. Returns ``(sigma, mu_star, U, lam)``."""
    orig_dtype = draws_buffer.dtype
    compute_dtype = jnp.float64 if jax.config.jax_enable_x64 else orig_dtype
    draws_buffer = draws_buffer.astype(compute_dtype)
    grads_buffer = grads_buffer.astype(compute_dtype)

    B, d = draws_buffer.shape
    # modular writes can push the raw count past capacity; every row is
    # valid then, so the effective support is B
    n = jnp.minimum(n, B)
    mask = (jnp.arange(B) < n).astype(compute_dtype)
    n_safe = jnp.maximum(n, 2).astype(compute_dtype)

    # step 1: diagonal scale sigma = (Var[x] / Var[grad])^{1/4}, population
    # variances (nutpie convention), plus the optimal translation mu*
    mean_x = (mask[:, None] * draws_buffer).sum(0) / n_safe
    mean_g = (mask[:, None] * grads_buffer).sum(0) / n_safe
    diff_x = mask[:, None] * (draws_buffer - mean_x[None, :])
    diff_g = mask[:, None] * (grads_buffer - mean_g[None, :])
    var_x = (diff_x**2).sum(0) / n_safe
    var_g = (diff_g**2).sum(0) / n_safe

    sigma = jnp.power(jnp.clip(var_x / jnp.maximum(var_g, 1e-10), 0.0, None), 0.25)
    sigma = jnp.clip(sigma, 1e-20, 1e20)
    mu_star = mean_x + sigma**2 * mean_g

    # steps 2-4: whiten both streams, combine their principal subspaces
    X = diff_x / sigma[None, :]
    A = diff_g * sigma[None, :]
    _, _, Vt_x = jnp.linalg.svd(X, full_matrices=False)
    _, _, Vt_a = jnp.linalg.svd(A, full_matrices=False)
    combined = jnp.concatenate([Vt_x[:max_rank].T, Vt_a[:max_rank].T], axis=1)
    Q, _ = jnp.linalg.qr(combined)
    q = Q.shape[1]

    # steps 5-7: projected covariances with raw-gamma regularization, AIRM
    # geometric mean against the INVERTED score covariance (Theorem 2.3)
    P_x = Q.T @ X.T
    P_a = Q.T @ A.T
    C_x = (P_x @ P_x.T) / gamma + jnp.eye(q, dtype=compute_dtype)
    C_a = (P_a @ P_a.T) / gamma + jnp.eye(q, dtype=compute_dtype)
    Sigma = _spd_mean(C_x, jnp.linalg.inv(C_a))

    # steps 8-9: eigendecompose, floor, select + mask + pad
    vals, vecs = jnp.linalg.eigh(Sigma)
    vals = jnp.maximum(vals, _relative_pd_floor(vals))
    U_full = Q @ vecs
    U_out, lam_out = select_top_eigenvalues_by_informativeness(
        vals, U_full, max_rank, tail_handling="mask_pad", cutoff=cutoff
    )
    return (
        sigma.astype(orig_dtype),
        mu_star.astype(orig_dtype),
        U_out.astype(orig_dtype),
        lam_out.astype(orig_dtype),
    )


def fisher_score_low_rank(
    draws: Array,
    grads: Array,
    max_rank: int,
    *,
    gamma: float = 1e-5,
    cutoff: float = 2.0,
) -> LowRankInverseMassMatrix:
    """Fisher-divergence-minimizing low-rank+diagonal inverse mass matrix
    from draws AND score gradients (all rows valid). nutpie-parity defaults
    ``gamma=1e-5``, ``cutoff=2``. Prefer x64 for this pipeline."""
    sigma, _, U, lam = _compute_low_rank_metric(
        draws, grads, draws.shape[0], max_rank, gamma, cutoff
    )
    return LowRankInverseMassMatrix(sigma=sigma, U=U, lam=lam)


def draws_singular_value_low_rank(
    draws: Array, max_rank: int, row_mask: Optional[Array] = None
) -> LowRankInverseMassMatrix:
    """Low-rank payload from the thin SVD of standardized draws (draws only,
    no regularization, raw eigenvalues — the MCLMC-LRD pilot estimator).
    Requires ``max_rank <= min(n, d)``.

    ``row_mask`` marks valid rows of a partially-filled raw-draw ring
    (:func:`blackjax_tpu.adaptation.metric_buffers.raw_draw_ring_buffer`):
    masked rows are zeroed AFTER standardization, which is exact — zero rows
    contribute nothing to ``X^T X``, so the singular structure equals the
    valid submatrix's."""
    if row_mask is None:
        mean = jnp.mean(draws, axis=0)
        n = draws.shape[0]
        var = jnp.mean((draws - mean[None, :]) ** 2, axis=0)
    else:
        n = jnp.maximum(jnp.sum(row_mask), 1.0)
        masked = jnp.where(row_mask[:, None], draws, 0.0)
        mean = jnp.sum(masked, axis=0) / n
        var = (
            jnp.sum(
                jnp.where(row_mask[:, None], (draws - mean[None, :]) ** 2, 0.0),
                axis=0,
            )
            / n
        )
    sigma = jnp.sqrt(var)
    sigma = jnp.where(sigma == 0.0, 1.0, sigma)
    standardized = (draws - mean[None, :]) / sigma[None, :]
    if row_mask is not None:
        standardized = jnp.where(row_mask[:, None], standardized, 0.0)

    _, S, Vt = jnp.linalg.svd(standardized, full_matrices=False)
    lam = (S**2) / n
    U_k, lam_k = select_top_eigenvalues_by_informativeness(
        lam, Vt.T, max_rank, tail_handling="raw"
    )
    return LowRankInverseMassMatrix(sigma=sigma, U=U_k, lam=lam_k)


def sample_covariance_eigh_low_rank(
    m2: Array, count: Union[Array, int], max_rank: int
) -> LowRankInverseMassMatrix:
    """Low-rank payload from an accumulated M2 matrix: Bessel-corrected
    covariance -> correlation -> eigh -> raw top-k (the MEADS Scheme-B
    estimator). Caller gates on sufficient support."""
    covariance = m2 / jnp.maximum(count - 1.0, 1.0)
    variance = jnp.diag(covariance)
    sigma = jnp.sqrt(jnp.maximum(variance, 0.0))
    sigma = jnp.where(sigma <= 0.0, 1.0, sigma)
    inv_sigma = 1.0 / sigma
    correlation = covariance * inv_sigma[:, None] * inv_sigma[None, :]

    lam_all, V = jnp.linalg.eigh(correlation)
    U, lam = select_top_eigenvalues_by_informativeness(
        lam_all, V, max_rank, tail_handling="raw"
    )
    return LowRankInverseMassMatrix(sigma=sigma, U=U, lam=lam)


def welford_diagonal(draws: Array) -> Array:
    """Bessel-corrected per-coordinate sample variance via streaming Welford."""
    n, d = draws.shape
    wc_init, wc_update, wc_final = welford_algorithm(is_diagonal_matrix=True)
    final, _ = jax.lax.scan(lambda s, x: (wc_update(s, x), None), wc_init(d), draws)
    covariance, _, _ = wc_final(final)
    return covariance


def welford_dense(draws: Array) -> Array:
    """Bessel-corrected sample covariance matrix via streaming Welford."""
    n, d = draws.shape
    wc_init, wc_update, wc_final = welford_algorithm(is_diagonal_matrix=False)
    final, _ = jax.lax.scan(lambda s, x: (wc_update(s, x), None), wc_init(d), draws)
    covariance, _, _ = wc_final(final)
    return covariance


def fisher_score_diagonal_from_moments(
    variance: Array, gradient_variance: Array
) -> Array:
    """Diagonal Fisher IMM ``sigma^2 = sqrt(Var[x] / Var[grad log p])`` from
    precomputed per-coordinate variances; the clip ``[1e-20, 1e20]`` applies
    to sigma BEFORE squaring (nutpie range)."""
    sigma = jnp.power(
        jnp.clip(variance / jnp.maximum(gradient_variance, 1e-10), 0.0, None), 0.25
    )
    sigma = jnp.clip(sigma, 1e-20, 1e20)
    return sigma**2


def fisher_score_diagonal(draws: Array, grads: Array) -> Array:
    """Diagonal Fisher IMM from raw draws and gradients."""
    return fisher_score_diagonal_from_moments(
        welford_diagonal(draws), welford_diagonal(grads)
    )


def sample_variance_diagonal(draws: Array) -> Array:
    """Population per-coordinate variance ``E[x^2] - E[x]^2`` (the MCLMC
    streaming convention)."""
    x_average = jnp.mean(draws, axis=0)
    return jnp.mean(draws**2, axis=0) - jnp.square(x_average)
