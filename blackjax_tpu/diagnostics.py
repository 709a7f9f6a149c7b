"""Convergence diagnostics: R̂, rank-normalized split-R̂, Geyer/Stan effective
sample size, bulk/tail ESS, nested-R̂ for superchains, Pareto-k̂ and PSIS.

Behavioral parity target: ``blackjax/diagnostics.py`` (reference; R̂ at :33,
rank-normalized ``rhat`` at :86, ``effective_sample_size`` at :151, ``splitR``
at :285, ``ess_bulk``/``ess_tail`` at :382/:424, ``pareto_khat`` at :503,
``psis_weights`` at :610). Written TPU-first: everything is batched array
arithmetic + one FFT; no Python loops over chains.
"""
from functools import partial

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

from blackjax_tpu.types import Array, ArrayLike

__all__ = [
    "potential_scale_reduction",
    "rhat",
    "effective_sample_size",
    "ess",
    "ess_bulk",
    "ess_tail",
    "splitR",
    "pareto_khat",
    "psis_weights",
]


def _to_standard_axes(x: Array, chain_axis: int, sample_axis: int) -> Array:
    """Transpose so chains are axis 0 and samples axis 1 (rest appended)."""
    ndim = x.ndim
    c = chain_axis % ndim
    s = sample_axis % ndim
    rest = [i for i in range(ndim) if i not in (c, s)]
    return jnp.transpose(x, [c, s] + rest)


def _split_chains(x: Array) -> Array:
    """Split each chain in half along the sample axis: (M, N, ...) -> (2M, N//2, ...)."""
    m, n = x.shape[0], x.shape[1]
    half = n // 2
    x = x[:, : 2 * half]
    return x.reshape((2 * m, half) + x.shape[2:])


def potential_scale_reduction(
    input_array: ArrayLike, chain_axis: int = 0, sample_axis: int = 1
) -> Array:
    """Gelman–Rubin potential scale reduction R̂ (reference ``diagnostics.py:33``).

    Computed on the chains as given (no splitting, no rank normalization);
    use :func:`rhat` for the modern rank-normalized split variant.
    """
    x = _to_standard_axes(jnp.asarray(input_array), chain_axis, sample_axis)
    num_samples = x.shape[1]
    within = jnp.mean(jnp.var(x, axis=1, ddof=1), axis=0)
    between = num_samples * jnp.var(jnp.mean(x, axis=1), axis=0, ddof=1)
    var_plus = ((num_samples - 1) / num_samples) * within + between / num_samples
    return jnp.sqrt(var_plus / within)


def _rank_normalize(x: Array) -> Array:
    """Rank-normalize pooled draws with the Blom plotting position
    ``z = Phi^-1((r - 3/8) / (S + 1/4))`` (Vehtari et al. 2021)."""
    shape = x.shape
    rest = shape[2:]
    flat = x.reshape(-1, *rest) if rest else x.reshape(-1)
    total = flat.shape[0]

    def ranks_1d(v):
        order = jnp.argsort(v)
        r = jnp.empty_like(order).at[order].set(jnp.arange(1, total + 1))
        return r.astype(x.dtype)

    if rest:
        flat2 = flat.reshape(total, -1)
        r = jax.vmap(ranks_1d, in_axes=1, out_axes=1)(flat2).reshape(flat.shape)
    else:
        r = ranks_1d(flat)
    z = ndtri((r - 0.375) / (total + 0.25))
    return z.reshape(shape)


def rhat(input_array: ArrayLike, chain_axis: int = 0, sample_axis: int = 1) -> Array:
    """Rank-normalized split-R̂ (Vehtari et al. 2021; reference
    ``diagnostics.py:86``): max of the rank-normalized split-R̂ of the draws
    and of the folded draws ``|x - median|``."""
    x = _to_standard_axes(jnp.asarray(input_array), chain_axis, sample_axis)
    x = _split_chains(x)

    def split_rhat_of(v):
        return potential_scale_reduction(_rank_normalize(v))

    bulk = split_rhat_of(x)
    folded = split_rhat_of(jnp.abs(x - jnp.median(x, axis=(0, 1))))
    return jnp.maximum(bulk, folded)


def _autocovariance_fft(x: Array) -> Array:
    """Per-chain autocovariance by FFT, biased normalization (divide by N).

    ``x``: (M, N, ...) mean-centered per chain along axis 1. Returns the same
    shape with lag along axis 1.
    """
    n = x.shape[1]
    try:
        from scipy.fftpack import next_fast_len  # CPU-side, static

        m = int(next_fast_len(2 * n))
    except Exception:  # pragma: no cover
        m = 1 << (2 * n - 1).bit_length()
    f = jnp.fft.rfft(x, n=m, axis=1)
    acov = jnp.fft.irfft(f * jnp.conjugate(f), n=m, axis=1)[:, :n]
    return jnp.real(acov) / n


def effective_sample_size(
    input_array: ArrayLike, chain_axis: int = 0, sample_axis: int = 1
) -> Array:
    """Stan-compatible effective sample size (reference ``diagnostics.py:151``).

    Combines per-chain FFT autocovariances into a cross-chain correlogram
    ``rho_t = 1 - (W - mean_t) / var_plus`` and applies Geyer's initial
    positive + monotone sequence truncation.
    """
    x = _to_standard_axes(jnp.asarray(input_array), chain_axis, sample_axis)
    m, n = x.shape[0], x.shape[1]
    centered = x - jnp.mean(x, axis=1, keepdims=True)
    acov = _autocovariance_fft(centered)  # (M, N, ...) biased

    chain_var = acov[:, 0] * n / (n - 1.0)  # per-chain variance, ddof=1
    within = jnp.mean(chain_var, axis=0)
    if m > 1:
        between = n * jnp.var(jnp.mean(x, axis=1), axis=0, ddof=1)
        var_plus = within * (n - 1.0) / n + between / n
    else:
        var_plus = within * (n - 1.0) / n

    mean_acov = jnp.mean(acov, axis=0)  # (N, ...)
    rho = 1.0 - (within - mean_acov) / var_plus
    rho = rho.at[0].set(1.0)

    # Geyer: pair lags (2t, 2t+1); keep while pair-sums are positive, then
    # enforce a monotone non-increasing sequence of pair sums.
    num_pairs = n // 2
    pair_sums = rho[0 : 2 * num_pairs : 2] + rho[1 : 2 * num_pairs : 2]
    positive = pair_sums > 0.0
    # mask everything after the first non-positive pair
    keep = jnp.cumprod(positive, axis=0).astype(bool)
    pair_sums = jnp.where(keep, pair_sums, 0.0)
    # monotone: running minimum over kept prefix
    pair_sums = jax.lax.associative_scan(jnp.minimum, pair_sums, axis=0)
    pair_sums = jnp.maximum(pair_sums, 0.0)
    tau = -1.0 + 2.0 * jnp.sum(pair_sums, axis=0)
    ess_val = m * n / jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(m * n, x.dtype)))
    return jnp.minimum(ess_val, m * n * jnp.log10(jnp.asarray(m * n, x.dtype)))


ess = effective_sample_size


def ess_bulk(input_array: ArrayLike, chain_axis: int = 0, sample_axis: int = 1) -> Array:
    """Bulk ESS: Stan ESS of the rank-normalized split chains
    (reference ``diagnostics.py:382``)."""
    x = _to_standard_axes(jnp.asarray(input_array), chain_axis, sample_axis)
    x = _split_chains(x)
    return effective_sample_size(_rank_normalize(x))


def ess_tail(
    input_array: ArrayLike,
    chain_axis: int = 0,
    sample_axis: int = 1,
    prob: float = 0.90,
) -> Array:
    """Tail ESS (Vehtari et al. 2021): min over the lower/upper
    tail-indicator ESS of the split chains (reference ``diagnostics.py:424``;
    ``prob=0.90`` gives the 5th/95th percentiles, the arviz default).

    The indicators are NOT rank-normalized — an ESS over a binary series is
    well-defined directly, and rank-normalizing heavily-tied values destroys
    the autocovariance estimate.
    """
    x = _to_standard_axes(jnp.asarray(input_array), chain_axis, sample_axis)
    x = _split_chains(x)
    q_low = (1.0 - prob) / 2.0
    q_high = (1.0 + prob) / 2.0
    lo = jnp.quantile(x, q_low, axis=(0, 1))
    hi = jnp.quantile(x, q_high, axis=(0, 1))
    ess_lower = effective_sample_size((x <= lo).astype(x.dtype))
    ess_upper = effective_sample_size((x >= hi).astype(x.dtype))
    return jnp.minimum(ess_lower, ess_upper)


def splitR(position, num_chains, superchain_size, func_for_splitR=jnp.square):
    """Nested-R̂ over superchains (Margossian et al. 2023; reference
    ``diagnostics.py:285``). ``position`` is an ensemble snapshot of shape
    ``(num_chains, ...)``; chains are grouped into
    ``num_chains // superchain_size`` superchains that shared an init, and
    R̂ is computed from between/within-superchain variances of
    ``func_for_splitR(position)``."""
    fx = jax.vmap(func_for_splitR)(position)
    fx = fx.reshape(num_chains // superchain_size, superchain_size, -1)
    mean_k = jnp.mean(fx, axis=1)
    within_k = jnp.var(fx, axis=1, ddof=1)
    within = jnp.mean(within_k, axis=0)
    between = jnp.var(mean_k, axis=0, ddof=1)
    return jnp.sqrt(1.0 + between / within)


def _gpdfit(exceedances: Array) -> tuple[Array, Array]:
    """Empirical-Bayes generalized-Pareto fit (Zhang & Stephens 2009), as in
    arviz/loo. ``exceedances`` must be sorted ascending. Returns (k, sigma)
    with the PSIS prior regularization k <- (n k + 5) / (n + 10)."""
    x = exceedances
    n = x.shape[0]
    prior_bs = 3.0
    m_grid = 30 + int(jnp.sqrt(n))
    j = jnp.arange(1, m_grid + 1, dtype=x.dtype)
    # quartile-anchored grid of b values; floor the anchor so underflowed-
    # to-zero lower exceedances (extreme weight tails) cannot produce an
    # infinite grid
    q1 = x[jnp.maximum((n + 2) // 4 - 1, 0)]
    q1 = jnp.maximum(q1, 1e-30 * jnp.maximum(x[-1], 1e-30))
    bs = 1.0 / x[-1] + (1.0 - jnp.sqrt(m_grid / (j - 0.5))) / (prior_bs * q1)
    # profile likelihood at each b: k(b) = mean log1p(-b x) (NEGATIVE of the
    # usual shape for heavy tails since the optimal b is negative)
    k_of_b = jnp.mean(jnp.log1p(-bs[:, None] * x[None, :]), axis=1)
    log_lik = n * (jnp.log(-bs / k_of_b) - k_of_b - 1.0)
    w = jnp.exp(log_lik - jax.scipy.special.logsumexp(log_lik))
    b_hat = jnp.sum(bs * w)
    # the REPORTED shape flips the sign back: k = -mean log1p(-b x) would be
    # the internal convention; the Zhang-Stephens estimate is the positive
    # mean for heavy tails
    k_hat = jnp.mean(jnp.log1p(-b_hat * x))
    sigma = -k_hat / b_hat
    k_hat = (n * k_hat + 5.0) / (n + 10.0)
    return k_hat, sigma


def _gpinv(p: Array, k: Array, sigma: Array) -> Array:
    """Generalized-Pareto quantile function."""
    small = jnp.abs(k) < 1e-12
    safe_k = jnp.where(small, 1.0, k)
    x = jnp.where(
        small,
        -jnp.log1p(-p),
        jnp.expm1(-safe_k * jnp.log1p(-p)) / safe_k,
    )
    return sigma * x


def pareto_khat(x: ArrayLike, tail: str = "both", tail_frac: float = 0.10) -> Array:
    """Pareto shape k̂ of the draws' tail(s) (reference ``diagnostics.py:503``).

    ``tail`` is one of ``"left"``, ``"right"``, ``"both"`` (max of the two).
    """
    x = jnp.ravel(jnp.asarray(x))
    n = x.shape[0]
    m = max(int(tail_frac * n), 5)

    def khat_right(v):
        s = jnp.sort(v)
        tail_vals = s[n - m :]
        cutoff = s[n - m - 1]
        exceed = tail_vals - cutoff
        k, _ = _gpdfit(exceed)
        return k

    if tail == "right":
        return khat_right(x)
    if tail == "left":
        return khat_right(-x)
    return jnp.maximum(khat_right(x), khat_right(-x))


def psis_weights(log_ratios: Array, r_eff: float = 1.0) -> tuple[Array, Array]:
    """Pareto-smoothed importance sampling (Vehtari et al. 2024; reference
    ``diagnostics.py:610``).

    Returns ``(smoothed log weights, k_hat)``. The largest
    ``M = min(0.2 n, 3 sqrt(n / r_eff))`` raw weights are replaced by GPD
    order statistics fitted to the tail; weights are truncated at the raw
    maximum and left unnormalized (normalize with logsumexp downstream).
    """
    lw = jnp.ravel(jnp.asarray(log_ratios))
    n = lw.shape[0]
    m = int(min(0.2 * n, 3.0 * (n / r_eff) ** 0.5))
    if m < 5:
        return lw.reshape(jnp.shape(log_ratios)), jnp.asarray(jnp.inf, lw.dtype)

    max_lw = jnp.max(lw)
    order = jnp.argsort(lw)
    sorted_lw = lw[order]
    cutoff_log = sorted_lw[n - m - 1]
    tail_log = sorted_lw[n - m :]
    cutoff = jnp.exp(cutoff_log - max_lw)
    exceed = jnp.exp(tail_log - max_lw) - cutoff
    k, sigma = _gpdfit(exceed)

    # replace tail weights by expected GPD order statistics
    p = (jnp.arange(1, m + 1, dtype=lw.dtype) - 0.5) / m
    smoothed_tail = jnp.log(cutoff + _gpinv(p, k, sigma)) + max_lw
    smoothed_tail = jnp.minimum(smoothed_tail, max_lw)
    new_sorted = sorted_lw.at[n - m :].set(smoothed_tail)
    out = jnp.empty_like(new_sorted).at[order].set(new_sorted)
    return out.reshape(jnp.shape(log_ratios)), k
