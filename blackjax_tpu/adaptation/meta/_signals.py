"""Single-chain signals of the meta-adaptation controller: whitened residual
spectrum, rank selection, S_gap, held-out score-linearity R^2, and the
transient-mixing proxy.

Behavioral parity target: ``blackjax/adaptation/meta/_signals.py``
(``_compute_whitened_spectrum`` :41, ``_choose_rank`` :78, ``_compute_s_gap``
:95, ``_compute_r2_score_linearity`` :105 with the 3-tier
full-affine/projected/deferred fallback and the projected-subspace fix,
``_compute_transient_mixing_signal`` :185).

All computations use masked fixed-shape buffers so they stay scan-carry safe.
"""
import jax
import jax.numpy as jnp

from blackjax_tpu.adaptation.meta._calibration import (
    _MIN_TRAIN_D_RATIO,
    _MIN_TRAIN_K_RATIO,
    _R2_DEFERRED,
    _R2_FULL_AFFINE,
    _R2_PROJECTED,
    _TRANSIENT_MIXING_THRESHOLD,
)
from blackjax_tpu.types import Array


def _compute_whitened_spectrum(
    draws_buffer: Array, sigma: Array, n, max_rank: int
) -> tuple[Array, Array]:
    """Top ``max_rank`` eigenpairs of the diagonal-whitened sample covariance
    via thin SVD of the centered whitened draws; zero-padded to fixed shape."""
    B, d = draws_buffer.shape
    n_safe = jnp.maximum(n.astype(draws_buffer.dtype), 1.0)
    mask = (jnp.arange(B) < n).astype(draws_buffer.dtype)
    sigma_safe = jnp.maximum(sigma, 1e-20)
    mean_x = (mask[:, None] * draws_buffer).sum(0) / n_safe
    w = mask[:, None] * (draws_buffer - mean_x[None, :]) / sigma_safe[None, :]
    _, s, Vt = jnp.linalg.svd(w, full_matrices=False)
    eigs = (s**2) / n_safe
    actual = min(max_rank, min(B, d))
    if actual < max_rank:
        pad = max_rank - actual
        return (
            jnp.concatenate([eigs[:actual], jnp.zeros(pad, eigs.dtype)]),
            jnp.concatenate([Vt[:actual].T, jnp.zeros((d, pad), Vt.dtype)], axis=1),
        )
    return eigs[:max_rank], Vt[:max_rank].T


def _choose_rank(eigenvalues: Array, n, max_rank: int, cutoff: float = 2.0) -> Array:
    """Count of informative eigenvalues (outside [1/cutoff, cutoff]), capped
    by the estimation support ``n // 2`` and ``max_rank``."""
    informative = (eigenvalues > cutoff) | (eigenvalues < 1.0 / cutoff)
    count = informative.sum().astype(jnp.int32)
    return jnp.minimum(
        count, jnp.minimum((n // 2).astype(jnp.int32), jnp.int32(max_rank))
    )


def _compute_s_gap(eigenvalues: Array, k) -> Array:
    """Magnitude predictor S_gap(k) = lam_1 / lam_{k+1}; 1 when k = 0."""
    max_rank = eigenvalues.shape[0]
    k_i = jnp.clip(k.astype(jnp.int32), 0, max_rank - 1)
    lam1 = jnp.maximum(eigenvalues[0], 1e-10)
    lam_k1 = jnp.maximum(
        jax.lax.dynamic_index_in_dim(eigenvalues, k_i, keepdims=False), 1e-10
    )
    return jnp.where(k.astype(jnp.int32) == 0, jnp.ones_like(lam1), lam1 / lam_k1)


def _compute_r2_score_linearity(
    draws_buffer: Array,
    grads_buffer: Array,
    sigma: Array,
    n,
    U_k: Array,
    max_rank: int,
) -> tuple[Array, Array]:
    """Held-out score-linearity R^2 in the whitened space with a three-tier
    fallback: full-affine (n >= 16 d), projected onto span(U_k) (n >= 8(k+1))
    — nonlinearity ORTHOGONAL to U_k is invisible to a rank-k metric and must
    not gate escalation — or deferred (NaN). Returns ``(r2, mode_code)``;
    the mode is observed from the branch actually taken."""
    B, d = draws_buffer.shape
    n_f = n.astype(jnp.float32)
    n_safe = jnp.maximum(n_f, 2.0)
    mask = (jnp.arange(B) < n).astype(draws_buffer.dtype)
    sigma_safe = jnp.maximum(sigma, 1e-20)
    mean_x = (mask[:, None] * draws_buffer).sum(0) / n_safe
    mean_g = (mask[:, None] * grads_buffer).sum(0) / n_safe
    w = mask[:, None] * (draws_buffer - mean_x[None, :]) / sigma_safe[None, :]
    s_w = mask[:, None] * (grads_buffer - mean_g[None, :]) * sigma_safe[None, :]

    n_train = n // 2
    train_mask = mask * (jnp.arange(B) < n_train).astype(mask.dtype)
    test_mask = mask * (jnp.arange(B) >= n_train).astype(mask.dtype)

    def held_out_r2(feats, resp):
        p = feats.shape[1]
        tr = train_mask[:, None]
        FtF = (tr * feats).T @ (tr * feats)
        FtS = (tr * feats).T @ (tr * resp)
        A = jnp.linalg.lstsq(FtF + 1e-8 * jnp.eye(p, dtype=FtF.dtype), FtS, rcond=None)[0]
        te = test_mask[:, None]
        pred = (te * feats) @ A
        resp_te = te * resp
        n_te = jnp.maximum(test_mask.sum().astype(jnp.float32), 2.0)
        resp_mean = resp_te.sum(0) / n_te
        tss = ((resp_te - te * resp_mean[None, :]) ** 2).sum(0)
        rss = ((resp_te - pred) ** 2).sum(0)
        return jnp.median(1.0 - rss / jnp.maximum(tss, 1e-10))

    def full_affine():
        feats = jnp.concatenate([w, jnp.ones((B, 1), w.dtype)], axis=1)
        return held_out_r2(feats, s_w), jnp.int32(_R2_FULL_AFFINE)

    def projected():
        w_proj = w @ U_k
        s_proj = s_w @ U_k
        feats = jnp.concatenate([w_proj, jnp.ones((B, 1), w.dtype)], axis=1)
        return held_out_r2(feats, s_proj), jnp.int32(_R2_PROJECTED)

    def deferred():
        return jnp.asarray(float("nan"), s_w.dtype), jnp.int32(_R2_DEFERRED)

    min_full = float(2 * _MIN_TRAIN_D_RATIO * d)
    min_proj = float(2 * _MIN_TRAIN_K_RATIO * (max_rank + 1))
    return jax.lax.cond(
        n_f >= min_full,
        full_affine,
        lambda: jax.lax.cond(n_f >= min_proj, projected, deferred),
    )


def _compute_transient_mixing_signal(draws_buffer: Array, sigma: Array, n) -> Array:
    """Split-half normalized mean-difference proxy for the transient-mixing
    class (True = slow; reported in the verdict, buffer policy stays RESET)."""
    B, _ = draws_buffer.shape
    n_f = n.astype(draws_buffer.dtype)
    n_safe = jnp.maximum(n_f, 2.0)
    mask = (jnp.arange(B) < n).astype(draws_buffer.dtype)
    sigma_safe = jnp.maximum(sigma, 1e-20)
    mean_x = (mask[:, None] * draws_buffer).sum(0) / n_safe
    w = mask[:, None] * (draws_buffer - mean_x[None, :]) / sigma_safe[None, :]
    n_half = n // 2
    m1 = mask * (jnp.arange(B) < n_half).astype(mask.dtype)
    m2 = mask * (jnp.arange(B) >= n_half).astype(mask.dtype)
    n1 = jnp.maximum(m1.sum().astype(jnp.float32), 1.0)
    n2 = jnp.maximum(m2.sum().astype(jnp.float32), 1.0)
    mu1 = (m1[:, None] * w).sum(0) / n1
    mu2 = (m2[:, None] * w).sum(0) / n2
    std = jnp.maximum(((mask[:, None] * w**2).sum(0) / n_safe) ** 0.5, 1e-10)
    return jnp.max(jnp.abs(mu1 - mu2) / std) > _TRANSIENT_MIXING_THRESHOLD
