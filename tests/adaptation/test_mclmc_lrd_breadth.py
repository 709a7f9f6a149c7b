"""MCLMC-LRD warmup breadth: the diagnostics contract, pytree positions,
the adjusted inner-kernel path with its provenance keys, and the DA-ceiling
warning unit behavior.

Scenario parity target: the reference's
``tests/adaptation/test_mclmc_lrd_adaptation.py`` (diagnostics keys,
pytree position, adjusted path, TestDACeilingWarning).
"""
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.mclmc_lrd_adaptation import _warn_da_ceiling
from blackjax_tpu.mcmc import adjusted_mclmc as adjusted_mclmc_mod
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix


def _correlated_target(d=6, spike=12.0):
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + spike * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    return (lambda x: -0.5 * x @ prec @ x), v


def _small_run(rng_key, **kwargs):
    logdensity, _ = _correlated_target()
    defaults = dict(
        k=2,
        pilot_num_warmup=200,
        pilot_num_samples=600,
        lrd_num_steps=200,
        num_chains=1,
    )
    defaults.update(kwargs)
    return blackjax_tpu.mclmc_lrd_warmup(
        logdensity, jnp.ones(6), rng_key, **defaults
    )


def test_diagnostics_keys_and_types(rng_key):
    result = _small_run(rng_key)
    diag = result.diagnostics
    for key in (
        "inner_kernel", "n_eff", "k_safe", "k_used",
        "pilot_num_grad_evals", "pilot_L", "pilot_step_size",
        "lrd_L", "lrd_step_size", "e1_fired", "kappa_eff_pilot",
    ):
        assert key in diag, key
    assert diag["inner_kernel"] == "mclmc"
    assert isinstance(diag["pilot_num_grad_evals"], int)
    assert isinstance(diag["pilot_L"], float)
    assert isinstance(diag["lrd_step_size"], float)
    assert 1 <= diag["k_used"] <= 2
    assert diag["kappa_eff_pilot"] >= 1.0
    # the mclmc path carries NO adjusted-only provenance
    assert "L_init" not in diag and "floor_active" not in diag


def test_pytree_position(rng_key):
    """The warmup ravels pytree positions: the returned metric lives in the
    flat basis and the tuned kernel runs on the pytree state."""
    logdensity = lambda p: -0.5 * (
        jnp.sum(p["a"] ** 2) + jnp.sum((p["b"] - 1.0) ** 2) / 4.0
    )
    init = {"a": jnp.ones(2), "b": jnp.zeros(3)}
    result = blackjax_tpu.mclmc_lrd_warmup(
        logdensity, init, rng_key,
        k=2, pilot_num_warmup=150, pilot_num_samples=400, lrd_num_steps=150,
    )
    assert isinstance(result.inverse_mass_matrix, LowRankInverseMassMatrix)
    assert result.inverse_mass_matrix.sigma.shape == (5,)

    from blackjax_tpu.mcmc import mclmc as mclmc_mod

    kernel = mclmc_mod.build_kernel()
    state = mclmc_mod.init(init, logdensity, jax.random.key(5))
    state, _ = kernel(
        rng_key=jax.random.key(6),
        state=state,
        logdensity_fn=logdensity,
        inverse_mass_matrix=result.inverse_mass_matrix,
        L=result.L,
        step_size=result.step_size,
    )
    assert np.isfinite(np.asarray(state.position["a"])).all()


def test_adjusted_path_provenance_and_usability(rng_key):
    logdensity, v = _correlated_target()
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # ceiling warning possible on stiff runs
        result = _small_run(rng_key, inner_kernel="adjusted_mclmc")
    diag = result.diagnostics
    assert diag["inner_kernel"] == "adjusted_mclmc"
    for key in ("L_init", "floor_active", "N_sample"):
        assert key in diag, key
    assert float(result.step_size) > 0 and float(result.L) > 0

    kernel = adjusted_mclmc_mod.build_kernel()
    state = adjusted_mclmc_mod.init(jnp.ones(6), logdensity)

    def step(s, k):
        s, info = kernel(
            rng_key=k,
            state=s,
            logdensity_fn=logdensity,
            step_size=result.step_size,
            integration_steps_params=(2,),
            inverse_mass_matrix=result.inverse_mass_matrix,
        )
        return s, info.acceptance_rate

    _, acc = jax.lax.scan(step, state, jax.random.split(rng_key, 200))
    assert 0.3 < float(jnp.mean(acc)) <= 1.0


def test_da_ceiling_warning_unit():
    # at the ceiling: fires and names floor_factor
    with pytest.warns(UserWarning, match="floor_factor"):
        _warn_da_ceiling(final_step_size=1.0 / 1.1, L_anchor=1.0, floor_factor=1.0)
    # just below: fires (near-ceiling is still ceiling-constrained)
    with pytest.warns(UserWarning, match="ceiling"):
        _warn_da_ceiling(
            final_step_size=0.9995 / 1.1, L_anchor=1.0, floor_factor=1.0
        )
    # well below: silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        _warn_da_ceiling(final_step_size=0.5 / 1.1, L_anchor=1.0, floor_factor=1.0)
