"""Matmul-class analytic targets for the transposed ``(dim, chains)``
Pallas NUTS machine (:mod:`fused_nuts_dc`): Bayesian logistic regression
and the Finnish (regularized) horseshoe — the reference's own flagship
perf posterior (``/root/reference/docs/examples/speed_up_guide.md:193``,
``tests/test_benchmarks.py:65-165``).

The design constraint of the ``(dim, chains)`` layout is that the DATA axis
(N observations) only ever appears as the sublane axis of an MXU matmul
*output* — never as something a host vector must broadcast onto lane-wise
(column broadcasts pay the MXU-relayout tax the layout exists to avoid).
Both targets therefore fold every ``y``-dependent contraction into
precomputed ``(d,)``/``(M,)`` vectors on the host:

- logistic regression: ``sum_n y_n logit_n = (X^T y) . w`` and
  ``grad = X^T y - X^T sigmoid(Xw) - w / s^2`` — the kernel touches ``y``
  only through the host-side ``v = X^T y``.
- horseshoe: ``SSR = yy - 2(u.beta + alpha*sy) + sum_n q^2 + 2 alpha s.beta
  + N alpha^2`` with ``q = X beta``, ``u = X^T y``, ``s = X^T 1`` — the
  residual vector itself is never materialized; its two data-axis
  reductions (``sum q``, ``sum q^2``) are native axis-0 sums that *produce*
  ``(1, T)`` rows.

Each gradient is exactly two MXU contractions (``X @ beta`` and
``X^T @ (.)``) shared with the log-density via ``vg_tile``; everything
else is row-broadcast elementwise algebra.

Zero-padding discipline: padded rows of ``X`` are zero, so padded logits
are exactly 0 — ``log(1+e^0) = log 2`` per padded row is a position-
independent constant subtracted at build time, and padded sigmoid values
(0.5) multiply zero columns of ``X^T``. No runtime data mask anywhere.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np

from blackjax_tpu.ops.fused_leapfrog import _round_up
from blackjax_tpu.ops.fused_nuts_dc import TargetKernelDC

__all__ = [
    "make_logreg_target_dc",
    "make_finnish_horseshoe_target_dc",
    "make_eight_schools_target_dc",
    "horseshoe_dc_perm",
    "eight_schools_dc_perm",
]

_SUBLANE = 8


def _dot(a, b, contract_a, contract_b):
    return jax.lax.dot_general(
        a,
        b,
        dimension_numbers=(((contract_a,), (contract_b,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def make_logreg_target_dc(X, y, prior_scale: float = 10.0) -> TargetKernelDC:
    """Bayesian logistic regression ``w ~ N(0, prior_scale^2 I)``,
    ``y_i ~ Bernoulli(sigmoid(x_i . w))``, transposed tiles.

    Reference counterpart: the covertype logistic-regression workload of
    the reference benchmark suite (``tests/test_benchmarks.py``); the cd
    twin is :func:`fused_leapfrog.make_logistic_regression_target`.
    """
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32).reshape(-1)
    n_data, dim = X.shape
    inv_pv = 1.0 / float(prior_scale) ** 2
    d_pad = _round_up(dim, _SUBLANE)
    n_pad = _round_up(n_data, _SUBLANE)

    X_pad = np.zeros((n_pad, d_pad), np.float32)
    X_pad[:n_data, :dim] = X
    v = X.T @ y  # (dim,): the only y the kernel ever sees
    # padded X rows give logits exactly 0 => softplus contributes log 2 each
    pad_const = float((n_pad - n_data) * math.log(2.0))

    def _core(w, v_col, X_op):
        logits = _dot(X_op, w, 1, 0)  # (n_pad, T) — MXU
        sig = jax.nn.sigmoid(logits)
        softplus = jnp.sum(
            jnp.logaddexp(0.0, logits), axis=0, keepdims=True
        )  # (1, T)
        yxw = jnp.sum(v_col * w, axis=0, keepdims=True)
        prior = -0.5 * inv_pv * jnp.sum(w * w, axis=0, keepdims=True)
        ld = yxw - (softplus - pad_const) + prior
        return ld, sig

    def logdensity_tile(x, mask, v_col, X_op):
        ld, _ = _core(x * mask, v_col, X_op)
        return ld

    def grad_tile(x, mask, v_col, X_op):
        w = x * mask
        _, sig = _core(w, v_col, X_op)
        xts = _dot(X_op, sig, 0, 0)  # (d_pad, T) — MXU
        return (v_col - xts - inv_pv * w) * mask

    def vg_tile(x, mask, v_col, X_op):
        w = x * mask
        ld, sig = _core(w, v_col, X_op)
        xts = _dot(X_op, sig, 0, 0)
        return ld, (v_col - xts - inv_pv * w) * mask

    def logdensity_fn(w):
        logits = jnp.einsum("...d,nd->...n", w, jnp.asarray(X))
        loglik = jnp.sum(
            jnp.asarray(y) * logits - jnp.logaddexp(0.0, logits), axis=-1
        )
        return loglik - 0.5 * inv_pv * jnp.sum(w**2, axis=-1)

    return TargetKernelDC(
        name="logreg_dc",
        dim=dim,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
        params=(v, X_pad),
        vg_tile=vg_tile,
    )


def horseshoe_dc_perm(num_predictors: int):
    """Index permutations between the model layout of
    :func:`blackjax_tpu.models.targets.finnish_horseshoe`
    (``[alpha, log_sigma, log_tau, log_c2, log_lam(M), beta_t(M)]``) and
    the dc-kernel layout (``[log_lam(M), beta_t(M), alpha, log_sigma,
    log_tau, log_c2]`` — the big blocks first so every slice offset is a
    sublane multiple). Returns ``(to_dc, from_dc)`` index arrays:
    ``x_dc = x_model[to_dc]``, ``x_model = x_dc[from_dc]``.
    """
    M = num_predictors
    to_dc = np.concatenate(
        [np.arange(4, 4 + 2 * M), np.arange(4)]
    )  # blocks first, scalars last
    from_dc = np.argsort(to_dc)
    return to_dc, from_dc


def make_finnish_horseshoe_target_dc(
    num_points: int = 100,
    num_predictors: int = 200,
    expected_nonzero: int = 10,
    slab_scale: float = 3.0,
    slab_df: float = 25.0,
    seed: int = 42,
    X=None,
    y=None,
) -> TargetKernelDC:
    """Regularized ("Finnish") horseshoe sparse regression (Piironen &
    Vehtari 2017) in the dc-kernel layout.

    Identical posterior to :func:`blackjax_tpu.models.targets
    .finnish_horseshoe` (same default dataset, same log-density up to the
    coordinate permutation of :func:`horseshoe_dc_perm`); the layout puts
    the two ``M``-blocks first so the kernel's sublane slices land on
    8-aligned offsets. Requires ``num_predictors % 8 == 0``.
    """
    M, N = num_predictors, num_points
    if M % _SUBLANE:
        raise ValueError(f"num_predictors must be a multiple of 8, got {M}")
    if X is None or y is None:
        rng = np.random.default_rng(seed)
        X = rng.standard_normal((N, M)).astype(np.float32)
        truth = np.zeros(M)
        hot = rng.random(M) < 0.05
        truth[hot] = rng.standard_normal(int(hot.sum())) + 10.0
        y = (X @ truth + rng.standard_normal(N)).astype(np.float32)
    X = np.asarray(X, np.float32)
    y = np.asarray(y, np.float32).reshape(-1)
    dim = 2 * M + 4

    # Python floats (weak-typed): a stray np.float64 scalar would promote
    # the whole kernel carry to f64 under x64
    tau0 = float(expected_nonzero / ((M - expected_nonzero) * np.sqrt(N)))
    half_df = 0.5 * float(slab_df)
    slab2 = float(slab_scale) ** 2

    n_pad = _round_up(N, _SUBLANE)
    X_pad = np.zeros((n_pad, M), np.float32)
    X_pad[:N] = X
    u = X.T @ y  # (M,)
    s = X.sum(axis=0)  # (M,) = X^T 1
    sy = float(y.sum())
    yy = float((y * y).sum())

    def _unpack(x):
        log_lam = x[0:M, :]
        beta_t = x[M : 2 * M, :]
        tail = x[2 * M : 2 * M + 8, :]  # (8, T); rows 4..7 are padding = 0
        rid = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 0)

        def row(k):
            return jnp.sum(
                jnp.where(rid == k, tail, 0.0), axis=0, keepdims=True
            )

        return log_lam, beta_t, row(0), row(1), row(2), row(3)

    def _core(x, u_col, s_col, X_op):
        """Everything both the value and the gradient need — ONE ``X @ beta``
        contraction, shared."""
        log_lam, beta_t, alpha, log_sigma, log_tau, log_c2 = _unpack(x)
        sigma = jnp.exp(log_sigma)  # (1, T) rows throughout
        inv_s2 = jnp.exp(-2.0 * log_sigma)
        tau = tau0 * sigma * jnp.exp(log_tau)
        c2 = slab2 * jnp.exp(log_c2)
        lam2 = jnp.exp(2.0 * log_lam)  # (M, T)
        denom = c2 + tau**2 * lam2  # rows broadcast natively
        lam_reg = jnp.sqrt(c2 * lam2 / denom)
        beta = tau * lam_reg * beta_t  # (M, T)

        q = _dot(X_op, beta, 1, 0)  # (n_pad, T) — MXU; padded rows -> 0
        sum_q = jnp.sum(q, axis=0, keepdims=True)
        sum_q2 = jnp.sum(q * q, axis=0, keepdims=True)
        u_beta = jnp.sum(u_col * beta, axis=0, keepdims=True)
        s_beta = jnp.sum(s_col * beta, axis=0, keepdims=True)
        ssr = (
            yy
            - 2.0 * (u_beta + alpha * sy)
            + sum_q2
            + 2.0 * alpha * (s_beta + 0.5 * N * alpha)
        )
        return dict(
            log_lam=log_lam, beta_t=beta_t, alpha=alpha, log_sigma=log_sigma,
            log_tau=log_tau, log_c2=log_c2, sigma=sigma, inv_s2=inv_s2,
            tau=tau, c2=c2, lam2=lam2, denom=denom, lam_reg=lam_reg,
            beta=beta, q=q, sum_q=sum_q, ssr=ssr,
        )

    def _value(c):
        loglik = -N * c["log_sigma"] - 0.5 * c["ssr"] * c["inv_s2"]
        lp = -0.125 * c["alpha"] ** 2
        lp += -0.125 * c["sigma"] ** 2 + c["log_sigma"]
        lp += -jnp.log1p(jnp.exp(2.0 * c["log_tau"])) + c["log_tau"]
        lp += -half_df * c["log_c2"] - half_df * jnp.exp(-c["log_c2"])
        lp += jnp.sum(
            -jnp.log1p(c["lam2"]) + c["log_lam"], axis=0, keepdims=True
        )
        lp += -0.5 * jnp.sum(c["beta_t"] ** 2, axis=0, keepdims=True)
        return lp + loglik

    def _grad(c, mask, u_col, s_col, X_op):
        """Chain rule through ``beta = tau * lam_reg(tau, c2, lam) * beta_t``;
        every likelihood path flows through ``g_beta = X^T resid / sigma^2 =
        (u - X^T q - alpha s) / sigma^2`` (the second MXU contraction)."""
        xtq = _dot(X_op, c["q"], 0, 0)  # (M, T) — MXU
        g_beta = (u_col - xtq - c["alpha"] * s_col) * c["inv_s2"]

        frac = c["c2"] / c["denom"]  # d log lam_reg / d log lam-ish factors
        g_beta_t = g_beta * c["tau"] * c["lam_reg"] - c["beta_t"]
        g_log_lam = (
            g_beta * c["beta"] * frac
            + 1.0
            - 2.0 * c["lam2"] / (1.0 + c["lam2"])
        )
        # likelihood response to a log-scale change of tau (also the sigma
        # path through tau, since tau = tau0 * sigma * e^{log_tau})
        t_lik = jnp.sum(g_beta * c["beta"] * frac, axis=0, keepdims=True)
        g_alpha = (
            (sy - c["sum_q"] - N * c["alpha"]) * c["inv_s2"]
            - 0.25 * c["alpha"]
        )
        g_log_tau = t_lik + 1.0 - 2.0 * jax.nn.sigmoid(2.0 * c["log_tau"])
        g_log_c2 = (
            jnp.sum(
                g_beta
                * c["beta"]
                * (c["tau"] ** 2 * c["lam2"])
                / (2.0 * c["denom"]),
                axis=0,
                keepdims=True,
            )
            - half_df
            + half_df * jnp.exp(-c["log_c2"])
        )
        g_log_sigma = (
            -N
            + c["ssr"] * c["inv_s2"]
            + t_lik
            - 0.25 * c["sigma"] ** 2
            + 1.0
        )

        rid8 = jax.lax.broadcasted_iota(
            jnp.int32, (8, g_alpha.shape[1]), 0
        )
        tail_g = (
            jnp.where(rid8 == 0, g_alpha, 0.0)
            + jnp.where(rid8 == 1, g_log_sigma, 0.0)
            + jnp.where(rid8 == 2, g_log_tau, 0.0)
            + jnp.where(rid8 == 3, g_log_c2, 0.0)
        )
        return jnp.concatenate([g_log_lam, g_beta_t, tail_g], axis=0) * mask

    def logdensity_tile(x, mask, u_col, s_col, X_op):
        return _value(_core(x, u_col, s_col, X_op))

    def grad_tile(x, mask, u_col, s_col, X_op):
        c = _core(x, u_col, s_col, X_op)
        return _grad(c, mask, u_col, s_col, X_op)

    def vg_tile(x, mask, u_col, s_col, X_op):
        c = _core(x, u_col, s_col, X_op)
        return _value(c), _grad(c, mask, u_col, s_col, X_op)

    def logdensity_fn(x):
        """dc-layout log-density (XLA-side parity twin of the tiles)."""
        log_lam = x[..., 0:M]
        beta_t = x[..., M : 2 * M]
        alpha = x[..., 2 * M]
        log_sigma = x[..., 2 * M + 1]
        log_tau = x[..., 2 * M + 2]
        log_c2 = x[..., 2 * M + 3]

        sigma = jnp.exp(log_sigma)
        tau = tau0 * sigma * jnp.exp(log_tau)
        c2 = slab2 * jnp.exp(log_c2)[..., None]
        lam2 = jnp.exp(2.0 * log_lam)
        lam_reg = jnp.sqrt(c2 * lam2 / (c2 + tau[..., None] ** 2 * lam2))
        beta = tau[..., None] * lam_reg * beta_t

        resid = jnp.asarray(y) - (
            jnp.einsum("...m,nm->...n", beta, jnp.asarray(X))
            + alpha[..., None]
        )
        loglik = -N * log_sigma - 0.5 * jnp.sum(
            (resid / sigma[..., None]) ** 2, axis=-1
        )
        lp = -0.125 * alpha**2
        lp += -0.125 * sigma**2 + log_sigma
        lp += -jnp.log1p(jnp.exp(2.0 * log_tau)) + log_tau
        lp += -half_df * log_c2 - half_df * jnp.exp(-log_c2)
        lp += jnp.sum(-jnp.log1p(lam2) + log_lam, axis=-1)
        lp += -0.5 * jnp.sum(beta_t**2, axis=-1)
        return lp + loglik

    return TargetKernelDC(
        name=f"finnish_horseshoe_dc_{N}x{M}",
        dim=dim,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
        params=(u, s, X_pad),
        vg_tile=vg_tile,
    )


def eight_schools_dc_perm():
    """Index permutations between the model layout of
    :func:`blackjax_tpu.models.targets.eight_schools_noncentered`
    (``[mu, log_tau, z(8)]``) and the dc-kernel layout (``[z(8), mu,
    log_tau]`` — the 8-block first so it sits on a sublane-aligned
    offset). Returns ``(to_dc, from_dc)``: ``x_dc = x_model[to_dc]``,
    ``x_model = x_dc[from_dc]``.
    """
    to_dc = np.concatenate([np.arange(2, 10), np.arange(2)])
    return to_dc, np.argsort(to_dc)


def make_eight_schools_target_dc() -> TargetKernelDC:
    """Non-centered eight schools in the dc-kernel layout (d=10).

    Identical posterior to :func:`blackjax_tpu.models.targets
    .eight_schools_noncentered` up to the coordinate permutation of
    :func:`eight_schools_dc_perm`. Not matmul-class — the whole gradient
    is row-broadcast elementwise algebra on one (8, T) block — but at 64
    chains the scan-of-vmap engine is latency-bound per step, which is
    exactly the regime the in-kernel machine removes.
    """
    y = np.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0], np.float32)
    sigma = np.array(
        [15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0], np.float32
    )
    inv_s2 = (1.0 / sigma**2).astype(np.float32)
    dim = 10

    def _unpack(x):
        z = x[0:8, :]
        tail = x[8:16, :]  # rows 0/1 = mu/log_tau, rows 2..7 padding = 0
        rid = jax.lax.broadcasted_iota(jnp.int32, tail.shape, 0)

        def row(k):
            return jnp.sum(
                jnp.where(rid == k, tail, 0.0), axis=0, keepdims=True
            )

        return z, row(0), row(1)

    def _core(x, y_col, is2_col):
        z, mu, log_tau = _unpack(x)
        tau = jnp.exp(log_tau)  # (1, T), broadcasts natively onto rows
        r = (y_col - mu - tau * z) * is2_col  # (8, T) weighted residual
        return z, mu, log_tau, tau, r

    def _value(z, mu, log_tau, tau, r, y_col, is2_col):
        resid = y_col - mu - tau * z
        lp = -0.02 * mu**2 - 0.02 * log_tau**2
        lp += -0.5 * jnp.sum(z * z, axis=0, keepdims=True)
        lp += -0.5 * jnp.sum(resid * r, axis=0, keepdims=True)
        return lp

    def _grad(z, mu, log_tau, tau, r, mask):
        g_z = -z + r * tau
        g_mu = -0.04 * mu + jnp.sum(r, axis=0, keepdims=True)
        g_lt = -0.04 * log_tau + tau * jnp.sum(
            r * z, axis=0, keepdims=True
        )
        rid8 = jax.lax.broadcasted_iota(jnp.int32, (8, g_mu.shape[1]), 0)
        tail_g = jnp.where(rid8 == 0, g_mu, 0.0) + jnp.where(
            rid8 == 1, g_lt, 0.0
        )
        return jnp.concatenate([g_z, tail_g], axis=0) * mask

    def logdensity_tile(x, mask, y_col, is2_col):
        z, mu, log_tau, tau, r = _core(x, y_col, is2_col)
        return _value(z, mu, log_tau, tau, r, y_col, is2_col)

    def grad_tile(x, mask, y_col, is2_col):
        z, mu, log_tau, tau, r = _core(x, y_col, is2_col)
        return _grad(z, mu, log_tau, tau, r, mask)

    def vg_tile(x, mask, y_col, is2_col):
        z, mu, log_tau, tau, r = _core(x, y_col, is2_col)
        return (
            _value(z, mu, log_tau, tau, r, y_col, is2_col),
            _grad(z, mu, log_tau, tau, r, mask),
        )

    def logdensity_fn(x):
        """dc-layout log-density (XLA-side parity twin of the tiles)."""
        z = x[..., 0:8]
        mu = x[..., 8]
        log_tau = x[..., 9]
        tau = jnp.exp(log_tau)
        theta = mu[..., None] + tau[..., None] * z
        lp = -0.02 * mu**2 - 0.02 * log_tau**2
        lp += -0.5 * jnp.sum(z**2, axis=-1)
        lp += jnp.sum(
            -0.5 * (jnp.asarray(y) - theta) ** 2 * jnp.asarray(inv_s2),
            axis=-1,
        )
        return lp

    return TargetKernelDC(
        name="eight_schools_dc",
        dim=dim,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
        params=(y, inv_s2),
        vg_tile=vg_tile,
    )
