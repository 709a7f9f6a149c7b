"""Router helpers for the multi-chain meta-adaptation path.

Behavioral parity target: ``blackjax/adaptation/meta/_router.py``
(``_geometric_mean_deploy_scale`` :34 — the f_disp-cancelling geometric mean
of the between-chain variance and the inverse pooled-Fisher curvature along
the slow direction, ``_compute_projected_gain_r2_mc`` :93 — the held-out
slope-heterogeneity GAIN with the abstain rule,
``_build_pc_centered_time_major_pool`` :236 — the per-chain-centered
time-major pooling that fixes the chain-major padding bug).
"""
import jax
import jax.numpy as jnp

from blackjax_tpu.adaptation.meta._calibration import _GAIN_READABILITY_FLOOR
from blackjax_tpu.types import Array


def _geometric_mean_deploy_scale(
    chain_means: Array,
    pooled_grads: Array,
    step_mask_all: Array,
    grand_mean: Array,
    e: Array,
    n_pool,
    M: int,
) -> Array:
    """``sigma^2_deploy = sqrt((B/n) / (eᵀ F e))``: the between-chain
    variance over-estimates the metric scale by the init-dispersion factor,
    the pooled Fisher curvature under-estimates by the same factor — the
    geometric mean cancels it."""
    mu_proj = (chain_means - grand_mean[None, :]) @ e
    B_over_n = (mu_proj**2).sum() / jnp.float32(M - 1)
    n_safe = jnp.maximum(n_pool.astype(pooled_grads.dtype), 1.0)
    fisher = (step_mask_all * (pooled_grads @ e) ** 2).sum() / n_safe
    return jnp.sqrt(
        jnp.maximum(B_over_n, jnp.float32(1e-20))
        / jnp.maximum(fisher, jnp.float32(1e-20))
    ).astype(jnp.float32)


def _compute_projected_gain_r2_mc(
    pc_draws_tm: Array,
    pc_grads_tm: Array,
    sigma_w_diag: Array,
    n,
    M: int,
    U_k: Array,
) -> tuple[Array, Array]:
    """Slope-heterogeneity GAIN = R2_perchain - R2_shared (both held-out:
    first half of each chain trains, second half tests). Positive only under
    genuine cross-region curvature heterogeneity (a Gaussian null overfits
    per-chain and gives GAIN <= 0). Returns (NaN, NaN) when the per-chain
    fits are unreadable (abstain)."""
    BM = pc_draws_tm.shape[0]
    B = BM // M
    k = U_k.shape[1]
    sigma_safe = jnp.maximum(sigma_w_diag, jnp.float32(1e-20))

    draws_3d = pc_draws_tm.reshape(B, M, -1)
    grads_3d = pc_grads_tm.reshape(B, M, -1)
    w_proj = (draws_3d / sigma_safe[None, None, :]) @ U_k  # (B, M, k)
    s_proj = (grads_3d * sigma_safe[None, None, :]) @ U_k

    n_half = n // 2
    step = jnp.arange(B, dtype=jnp.int32)
    train_mask = (step < n_half).astype(pc_draws_tm.dtype)
    test_mask = ((step >= n_half) & (step < n)).astype(pc_draws_tm.dtype)
    n_test = jnp.maximum(test_mask.sum().astype(jnp.float32), 2.0)

    # shared fit over the pooled train halves of every chain
    w_pool = w_proj.transpose(1, 0, 2).reshape(M * B, k)
    s_pool = s_proj.transpose(1, 0, 2).reshape(M * B, k)
    train_pool = jnp.tile(train_mask, M)[:, None]
    feats_pool = jnp.concatenate([w_pool, jnp.ones((M * B, 1), w_pool.dtype)], axis=1)
    FtF = (train_pool * feats_pool).T @ (train_pool * feats_pool)
    FtS = (train_pool * feats_pool).T @ (train_pool * s_pool)
    A_shared = jnp.linalg.lstsq(
        FtF + jnp.float32(1e-8) * jnp.eye(k + 1, dtype=FtF.dtype), FtS, rcond=None
    )[0]

    def chain_r2s(w_m, s_m):
        feats = jnp.concatenate([w_m, jnp.ones((B, 1), w_m.dtype)], axis=1)
        te = test_mask[:, None]
        s_test = te * s_m
        s_mean = s_test.sum(0) / n_test
        tss = jnp.maximum(((s_test - te * s_mean[None, :]) ** 2).sum(0), 1e-10)

        rss_shared = ((s_test - (te * feats) @ A_shared) ** 2).sum(0)
        r2_shared = jnp.median(1.0 - rss_shared / tss)

        tr = train_mask[:, None]
        FtF_m = (tr * feats).T @ (tr * feats)
        FtS_m = (tr * feats).T @ (tr * s_m)
        A_m = jnp.linalg.lstsq(
            FtF_m + jnp.float32(1e-8) * jnp.eye(k + 1, dtype=FtF_m.dtype),
            FtS_m,
            rcond=None,
        )[0]
        rss_pc = ((s_test - (te * feats) @ A_m) ** 2).sum(0)
        r2_pc = jnp.median(1.0 - rss_pc / tss)
        return r2_shared, r2_pc

    r2_sh, r2_pc = jax.vmap(chain_r2s)(
        w_proj.transpose(1, 0, 2), s_proj.transpose(1, 0, 2)
    )
    r2_shared = jnp.median(r2_sh)
    r2_perchain = jnp.median(r2_pc)
    gain = r2_perchain - r2_shared

    abstain = (r2_perchain < jnp.float32(_GAIN_READABILITY_FLOOR)) | ~jnp.isfinite(
        r2_perchain
    )
    nan = jnp.array(float("nan"), jnp.float32)
    return (
        jnp.where(abstain, nan, gain.astype(jnp.float32)),
        jnp.where(abstain, nan, r2_perchain.astype(jnp.float32)),
    )


def _build_pc_centered_time_major_pool(
    draws_buffer_mc: Array,
    grads_buffer_mc: Array,
    chain_means: Array,
    n,
    M: int,
) -> tuple[Array, Array, Array]:
    """Per-chain-centered draws/grads pooled TIME-MAJOR (row t*M+m): valid
    rows are contiguous at the front (first n*M), unlike chain-major pooling
    where zero padding interleaves; per-chain centering removes the
    between-chain offset that otherwise inflates the pooled R^2."""
    _M, B, d = draws_buffer_mc.shape
    step_mask = (jnp.arange(B) < n).astype(draws_buffer_mc.dtype)
    n_f = jnp.maximum(n.astype(draws_buffer_mc.dtype), 1.0)
    grad_means = (step_mask[None, :, None] * grads_buffer_mc).sum(1) / n_f

    pc_draws = draws_buffer_mc - chain_means[:, None, :]
    pc_grads = grads_buffer_mc - grad_means[:, None, :]
    return (
        pc_draws.swapaxes(0, 1).reshape(B * M, d),
        pc_grads.swapaxes(0, 1).reshape(B * M, d),
        jnp.repeat(step_mask, M),
    )
