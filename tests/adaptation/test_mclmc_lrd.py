"""MCLMC-LRD warmup and adjusted-MCLMC tuner tests.

Parity model: ``blackjax/tests/adaptation/test_mclmc_lrd_adaptation.py``
(extraction recovery, rank guard, kappa_eff accounting, end-to-end tuning).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.mclmc_lrd_adaptation import (
    _extract_lrd_from_samples,
    _kappa_eff_pilot,
)
from blackjax_tpu.mcmc import adjusted_mclmc as adjusted_mclmc_mod
from blackjax_tpu.mcmc import mclmc as mclmc_mod
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix


def test_extract_lrd_recovers_correlation_direction():
    d, n = 6, 4000
    key = jax.random.key(0)
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 24.0 * jnp.outer(v, v)
    draws = jax.random.normal(key, (n, d)) @ jnp.linalg.cholesky(cov).T

    sigma, U, lam, lam_all = _extract_lrd_from_samples(draws, k=2)
    # sigma ~ marginal std: diag(cov) = 1 + 24/6 = 5 -> std sqrt(5)
    np.testing.assert_allclose(np.asarray(sigma), np.sqrt(5.0), rtol=0.15)
    # the top |lam-1| eigenpair is the planted direction
    assert abs(float(U[:, 0] @ v)) > 0.98
    # full spectrum ordered by |lam - 1| descending, head == selected
    np.testing.assert_allclose(np.asarray(lam_all[:2]), np.asarray(lam), rtol=1e-6)
    assert np.all(np.diff(np.abs(np.asarray(lam_all) - 1.0)) <= 1e-6)


def test_kappa_eff_residual_accounting():
    # captured directions are whitened; the spread comes from the residuals
    lam_all = jnp.asarray([10.0, 0.1, 0.5, 1.0])
    # k=2: residuals {0.5, 1.0} -> eigs {2, 1} union {1} -> kappa = 2
    assert _kappa_eff_pilot(lam_all, 2) == pytest.approx(2.0)
    # k=4: everything whitened
    assert _kappa_eff_pilot(lam_all, 4) == 1.0
    # k=0: kappa of the correlation itself = (1/0.1)/(1/10) = 100
    assert _kappa_eff_pilot(lam_all, 0) == pytest.approx(100.0)


def test_lrd_warmup_unadjusted_end_to_end(rng_key):
    d = 8
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 15.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    logdensity = lambda x: -0.5 * x @ prec @ x

    result = blackjax_tpu.mclmc_lrd_warmup(
        logdensity,
        jnp.ones(d),
        rng_key,
        k=3,
        pilot_num_warmup=400,
        pilot_num_samples=1500,
        lrd_num_steps=400,
        num_chains=2,
    )
    assert isinstance(result.inverse_mass_matrix, LowRankInverseMassMatrix)
    assert float(result.step_size) > 0 and float(result.L) > 0
    diag = result.diagnostics
    assert diag["inner_kernel"] == "mclmc"
    assert diag["k_used"] <= 3 and diag["k_used"] >= 1
    assert diag["pilot_num_grad_evals"] == (400 + 1500) * 2
    assert diag["kappa_eff_pilot"] >= 1.0
    # planted direction captured by the LRD metric
    U = result.inverse_mass_matrix.U
    assert abs(float(U[:, 0] @ v)) > 0.9

    # the tuned kernel actually samples: run a short chain, check moments
    kernel = mclmc_mod.build_kernel()
    state = mclmc_mod.init(jnp.zeros(d), logdensity, jax.random.key(7))

    def step(s, k):
        s, _ = kernel(
            rng_key=k,
            state=s,
            logdensity_fn=logdensity,
            inverse_mass_matrix=result.inverse_mass_matrix,
            L=result.L,
            step_size=result.step_size,
        )
        return s, s.position

    _, samples = jax.lax.scan(step, state, jax.random.split(jax.random.key(8), 2000))
    var_stiff = float(jnp.var(samples @ v))
    assert 6.0 < var_stiff < 40.0  # true 16


def test_lrd_warmup_rank_guard_warns(rng_key):
    d = 4
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    with pytest.warns(UserWarning, match="rank-safety"):
        result = blackjax_tpu.mclmc_lrd_warmup(
            logdensity,
            jnp.ones(d),
            rng_key,
            k=10,
            pilot_num_warmup=100,
            pilot_num_samples=12,  # tiny pilot: n_eff small -> clamp
            lrd_num_steps=100,
            num_chains=1,
        )
    assert result.diagnostics["k_used"] < 10


def test_lrd_warmup_invalid_args(rng_key):
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    with pytest.raises(ValueError, match="inner_kernel"):
        blackjax_tpu.mclmc_lrd_warmup(
            logdensity, jnp.ones(3), rng_key, inner_kernel="nuts"
        )
    with pytest.raises(ValueError, match="warmup_step_init"):
        blackjax_tpu.mclmc_lrd_warmup(
            logdensity, jnp.ones(3), rng_key, warmup_step_init="magic"
        )


def test_adjusted_mclmc_tuner_calibrates_acceptance(rng_key):
    """The adjusted tuner's step converges so the adjusted kernel's observed
    acceptance is near the target, at the pinned avg=2 trajectory length."""
    d = 10
    scales = jnp.linspace(0.5, 3.0, d)
    logdensity = lambda x: -0.5 * jnp.sum((x / scales) ** 2)

    kernel = adjusted_mclmc_mod.build_kernel()
    state = adjusted_mclmc_mod.init(jnp.ones(d), logdensity)
    tune_key, run_key = jax.random.split(rng_key)

    state, params, n_int = blackjax_tpu.adjusted_mclmc_find_L_and_step_size(
        mclmc_kernel=kernel,
        logdensity_fn=logdensity,
        num_steps=2000,
        state=state,
        rng_key=tune_key,
        target=0.9,
    )
    # avg-preserving invariant: L = 2 * step
    assert float(params.L) == pytest.approx(2.0 * float(params.step_size), rel=1e-6)
    assert int(n_int) > 0

    def step(s, k):
        s, info = kernel(
            rng_key=k,
            state=s,
            logdensity_fn=logdensity,
            step_size=params.step_size,
            integration_steps_params=(2,),
            inverse_mass_matrix=params.inverse_mass_matrix,
        )
        return s, info.acceptance_rate

    _, acc = jax.lax.scan(step, state, jax.random.split(run_key, 400))
    assert 0.75 < float(jnp.mean(acc)) <= 1.0


def test_adjusted_mclmc_tuner_rejects_bad_max(rng_key):
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    kernel = adjusted_mclmc_mod.build_kernel()
    state = adjusted_mclmc_mod.init(jnp.ones(3), logdensity)
    with pytest.raises(ValueError, match="max"):
        blackjax_tpu.adjusted_mclmc_find_L_and_step_size(
            mclmc_kernel=kernel,
            logdensity_fn=logdensity,
            num_steps=100,
            state=state,
            rng_key=rng_key,
            target=0.9,
            max="median",
        )
