"""Dense and low-rank metric support in the dc NUTS machine (interpret
mode): consistency pins against the diagonal path, and statistical runs on
a correlated Gaussian.

Consistency pins are the sharp checks: a dense matrix that IS diagonal and
a low-rank payload with ``lam = 1`` both reduce algebraically to the
diagonal metric, and the in-kernel RNG stream depends only on (seed, chain,
step), so the three spellings must produce the same samples to f32
rounding.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.ops.fused_nuts_dc import (
    TargetKernelDC,
    fused_nuts_run_dc,
    make_gaussian_target_dc,
)

DIM = 4
VAR = jnp.array([1.0, 4.0, 0.25, 2.0])
C, S = 16, 10


def _run(imm, target=None, step_size=0.4, seed=3):
    target = target or make_gaussian_target_dc(DIM, VAR)
    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, target.dim))
    return fused_nuts_run_dc(
        x0,
        imm,
        step_size,
        target=target,
        num_steps=S,
        max_num_doublings=5,
        seed=seed,
        num_track=target.dim,
        budget=S * 40,
        chunk=16,
        interpret=True,
    )


def test_dense_diag_consistency():
    """diag(v) as a dense matrix == the diagonal path (same RNG stream)."""
    v = jnp.array([1.0, 2.0, 0.5, 1.5])
    fx_d, hist_d, grads_d, steps_d = _run(v)
    fx_m, hist_m, grads_m, steps_m = _run(jnp.diag(v))
    assert (np.asarray(steps_m) == S).all()
    np.testing.assert_allclose(
        np.asarray(hist_m), np.asarray(hist_d), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(steps_m), np.asarray(steps_d))


def test_low_rank_identity_core_consistency():
    """lam = 1 kills the low-rank core: M^{-1} = diag(sigma^2)."""
    sigma = jnp.array([1.0, 1.5, 0.7, 1.2])
    U, _ = jnp.linalg.qr(
        jax.random.normal(jax.random.key(5), (DIM, 2), jnp.float32)
    )
    lr = LowRankInverseMassMatrix(sigma=sigma, U=U, lam=jnp.ones(2))
    fx_l, hist_l, grads_l, steps_l = _run(lr)
    fx_d, hist_d, grads_d, steps_d = _run(sigma**2)
    assert (np.asarray(steps_l) == S).all()
    np.testing.assert_allclose(
        np.asarray(hist_l), np.asarray(hist_d), rtol=2e-5, atol=1e-5
    )
    np.testing.assert_array_equal(np.asarray(steps_l), np.asarray(steps_d))


def _correlated_gaussian_target(cov):
    """N(0, cov) as a dc target with the precision as a matrix param."""
    import numpy as onp

    cov = onp.asarray(cov, onp.float32)
    d = cov.shape[0]
    prec = onp.linalg.inv(cov).astype(onp.float32)
    d_pad = ((d + 7) // 8) * 8
    P = onp.zeros((d_pad, d_pad), onp.float32)
    P[:d, :d] = prec

    def _px(x, P_op):
        return jax.lax.dot_general(
            P_op,
            x,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def logdensity_tile(x, mask, P_op):
        w = x * mask
        return -0.5 * jnp.sum(w * _px(w, P_op), axis=0, keepdims=True)

    def grad_tile(x, mask, P_op):
        return -_px(x * mask, P_op) * mask

    def logdensity_fn(x):
        return -0.5 * jnp.einsum("...i,ij,...j->...", x, jnp.asarray(prec), x)

    return TargetKernelDC(
        name="correlated_gaussian_dc",
        dim=d,
        logdensity_tile=logdensity_tile,
        grad_tile=grad_tile,
        logdensity_fn=logdensity_fn,
        params=(P,),
    )


@pytest.fixture(scope="module")
def cov():
    rng = np.random.default_rng(1)
    A = rng.standard_normal((DIM, DIM))
    return (A @ A.T + DIM * np.eye(DIM)).astype(np.float32)


def test_dense_metric_correlated_gaussian(cov):
    """Well-adapted dense metric (M^{-1} = cov) on N(0, cov): completes,
    short trajectories, recovers the covariance diagonal."""
    target = _correlated_gaussian_target(cov)
    fx, hist, grads, steps = _run(
        jnp.asarray(cov), target=target, step_size=0.9, seed=11
    )
    assert (np.asarray(steps) == S).all()
    h = np.asarray(hist)
    assert np.isfinite(h).all()
    # perfectly preconditioned NUTS needs few leaves per transition
    mean_leaves = float(grads) / (C * S)
    assert mean_leaves < 16.0
    pooled = h[:, S // 2 :, :].reshape(-1, DIM)
    np.testing.assert_allclose(
        pooled.var(0), np.diag(cov), rtol=0.6
    )


def test_low_rank_metric_correlated_gaussian(cov):
    """Low-rank payload built from the eigendecomposition of cov: the
    exact M^{-1} = cov in D(I + U(Lam-I)U^T)D form — same behavior class
    as the dense run."""
    target = _correlated_gaussian_target(cov)
    # cov = D (I + U (Lam - I) U^T) D with D = diag(sqrt(diag(cov)))
    Dv = np.sqrt(np.diag(cov))
    corr = cov / np.outer(Dv, Dv)
    lam, U = np.linalg.eigh(corr)  # corr = U diag(lam) U^T, full rank k = d
    lr = LowRankInverseMassMatrix(
        sigma=jnp.asarray(Dv, jnp.float32),
        U=jnp.asarray(U, jnp.float32),
        lam=jnp.asarray(lam, jnp.float32),
    )
    fx, hist, grads, steps = _run(lr, target=target, step_size=0.9, seed=13)
    assert (np.asarray(steps) == S).all()
    h = np.asarray(hist)
    assert np.isfinite(h).all()
    assert float(grads) / (C * S) < 16.0
    pooled = h[:, S // 2 :, :].reshape(-1, DIM)
    np.testing.assert_allclose(pooled.var(0), np.diag(cov), rtol=0.6)


@pytest.mark.parametrize("imm_builder", ["dense", "low_rank"])
def test_pack_bitwise_under_rich_metrics(imm_builder):
    """Slot packing is scheduling-only under dense and low-rank metrics
    too (the carried-w machinery is orthogonal to the chain switch)."""
    if imm_builder == "dense":
        v = jnp.array([1.0, 2.0, 0.5, 1.5])
        imm = jnp.diag(v) + 0.05 * (jnp.ones((DIM, DIM)) - jnp.eye(DIM))
    else:
        imm = LowRankInverseMassMatrix(
            sigma=jnp.array([1.0, 1.5, 0.7, 1.2]),
            U=jnp.linalg.qr(
                jax.random.normal(jax.random.key(5), (DIM, 2))
            )[0],
            lam=jnp.array([3.0, 0.5]),
        )
    target = make_gaussian_target_dc(DIM, VAR)
    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, target.dim))

    def run(pack):
        return fused_nuts_run_dc(
            x0, imm, 0.3,
            target=target, num_steps=S, max_num_doublings=5, seed=3,
            num_track=target.dim, budget=S * 40 * pack, chunk=16,
            pack=pack, interpret=True,
        )

    for a, b, name in zip(run(1), run(4), ["final_x", "hist", "grads", "steps"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
