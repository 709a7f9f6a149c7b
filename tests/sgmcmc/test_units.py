"""SGMCMC unit breadth: diffusion mechanics, gradient-estimator contracts,
kernel state/shape invariants, and jit pins for every family member.

Scenario parity targets in the reference suite:
``tests/sgmcmc/test_diffusions.py``, ``test_gradients.py``,
``test_kernels.py``.
"""
import operator

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.sgmcmc import csgld as csgld_mod
from blackjax_tpu.sgmcmc import diffusions, gradients
from blackjax_tpu.sgmcmc import sgnht as sgnht_mod

# exactness pins run in both precision passes: full precision under x64,
# f32 rounding (~1e-7 relative) otherwise
import jax as _jax
_X64 = _jax.config.jax_enable_x64
RTOL_EXACT = 1e-10 if _X64 else 5e-6


# ---------------------------------------------------------------------------
# diffusion mechanics
# ---------------------------------------------------------------------------


def test_langevin_zero_grad_moves_only_via_noise(rng_key):
    step = diffusions.overdamped_langevin()
    x = jnp.zeros(4)
    g = jnp.zeros(4)
    out = step(rng_key, x, g, step_size=0.01)
    noise = 0.0 + jnp.sqrt(2 * 0.01) * jax.random.normal(rng_key, (4,))
    np.testing.assert_allclose(np.asarray(out), np.asarray(noise), rtol=1e-12)


def test_langevin_temperature_zero_is_pure_gradient_flow(rng_key):
    step = diffusions.overdamped_langevin()
    x = jnp.array([1.0, -1.0])
    g = jnp.array([2.0, 3.0])
    out = step(rng_key, x, g, step_size=0.1, temperature=0.0)
    np.testing.assert_allclose(np.asarray(out), [1.2, -0.7], rtol=RTOL_EXACT)


def test_sghmc_position_update_uses_only_momentum(rng_key):
    step = diffusions.sghmc(alpha=0.1)
    x, p = jnp.array([0.0, 0.0]), jnp.array([1.0, -2.0])
    g = jnp.array([100.0, 100.0])  # must not enter the position update
    new_x, _ = step(rng_key, x, p, g, step_size=0.5)
    np.testing.assert_allclose(np.asarray(new_x), [0.5, -1.0], rtol=1e-12)


def test_sghmc_friction_shrinks_momentum(rng_key):
    # zero gradient, zero temperature: p' = (1 - alpha h) p exactly
    step = diffusions.sghmc(alpha=0.2)
    p = jnp.array([4.0, -4.0])
    _, new_p = step(
        rng_key, jnp.zeros(2), p, jnp.zeros(2), step_size=0.5, temperature=0.0
    )
    np.testing.assert_allclose(np.asarray(new_p), 0.9 * np.asarray(p), rtol=1e-12)


def test_sgnht_thermostat_tracks_kinetic_temperature(rng_key):
    """xi increases when the kinetic energy per dof exceeds the temperature
    and decreases when it is below (zero temperature kills the noise so the
    update is deterministic up to the gradient term)."""
    step = diffusions.sgnht(alpha=0.1)
    x, g = jnp.zeros(2), jnp.zeros(2)
    # hot momentum: |p'|^2/d ~ 4 >> T = 0 -> xi must rise
    *_, xi_hot = step(rng_key, x, jnp.array([2.0, -2.0]), 0.5, g, 0.01, temperature=0.0)
    assert float(xi_hot) > 0.5
    # cold momentum at T = 1: kinetic energy per dof << T -> xi must fall
    *_, xi_cold = step(
        rng_key, x, jnp.array([1e-4, -1e-4]), 0.5, g, 0.01, temperature=1.0
    )
    assert float(xi_cold) < 0.5


def test_sgnht_reduces_to_sghmc_when_xi_equals_alpha(rng_key):
    """With xi == alpha the thermostat step produces the same position and
    momentum as the fixed-friction SGHMC step (same key, same noise)."""
    alpha = 0.17
    x, p = jnp.array([0.3, -0.4]), jnp.array([1.0, 0.5])
    g = jnp.array([-0.2, 0.9])
    x1, p1 = diffusions.sghmc(alpha=alpha)(rng_key, x, p, g, 0.05)
    x2, p2, _ = diffusions.sgnht(alpha=alpha)(rng_key, x, p, alpha, g, 0.05)
    np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-12)


def test_diffusions_pytree_position(rng_key):
    tree = {"a": jnp.ones((2,)), "b": jnp.zeros(())}
    grad = jax.tree.map(jnp.zeros_like, tree)
    out = diffusions.overdamped_langevin()(rng_key, tree, grad, 0.01)
    assert jax.tree.structure(out) == jax.tree.structure(tree)
    x, p = diffusions.sghmc()(rng_key, tree, grad, grad, 0.01)
    assert jax.tree.structure(x) == jax.tree.structure(tree)
    x, p, xi = diffusions.sgnht()(rng_key, tree, grad, 0.3, grad, 0.01)
    assert jax.tree.structure(p) == jax.tree.structure(tree)
    assert jnp.ndim(xi) == 0


def test_diffusions_jit_compatible(rng_key):
    out = jax.jit(lambda k: diffusions.overdamped_langevin()(
        k, jnp.zeros(3), jnp.ones(3), 0.01
    ))(rng_key)
    assert out.shape == (3,)


# ---------------------------------------------------------------------------
# gradient estimators
# ---------------------------------------------------------------------------


def _toy_model():
    data = jnp.arange(10.0)
    logprior = lambda x: -0.5 * jnp.sum(x**2)
    loglik = lambda x, datum: -0.5 * jnp.sum((datum - x) ** 2)
    return data, logprior, loglik


def test_logdensity_estimator_scalar_and_finite(rng_key):
    data, logprior, loglik = _toy_model()
    est = gradients.logdensity_estimator(logprior, loglik, data_size=10)
    val = est(jnp.array(1.0), data[:5])
    assert jnp.ndim(val) == 0
    assert np.isfinite(float(val))


def test_logdensity_estimator_full_batch_is_exact():
    data, logprior, loglik = _toy_model()
    est = gradients.logdensity_estimator(logprior, loglik, data_size=10)
    x = jnp.array(0.7)
    exact = logprior(x) + sum(float(loglik(x, d)) for d in data)
    np.testing.assert_allclose(float(est(x, data)), exact, rtol=1e-10)


def test_logdensity_estimator_scales_with_data_size():
    data, logprior, loglik = _toy_model()
    x = jnp.array(0.0)
    batch = data[:5]
    small = gradients.logdensity_estimator(logprior, loglik, data_size=10)(x, batch)
    large = gradients.logdensity_estimator(logprior, loglik, data_size=100)(x, batch)
    # likelihood part is scaled by N: (large - prior) = 10x (small - prior)
    prior = float(logprior(x))
    np.testing.assert_allclose(
        float(large) - prior, 10.0 * (float(small) - prior), rtol=1e-10
    )


def test_grad_estimator_matches_manual_gradient():
    data, logprior, loglik = _toy_model()
    grad_est = gradients.grad_estimator(logprior, loglik, data_size=10)
    x = jnp.array(0.5)
    batch = data[:4]
    # d/dx [ -x^2/2 + N * mean(-(d-x)^2/2) ] = -x + N * mean(d - x)
    expected = -0.5 + 10.0 * float(jnp.mean(batch - 0.5))
    np.testing.assert_allclose(float(grad_est(x, batch)), expected, rtol=1e-10)


def test_grad_estimator_pytree_position():
    data = jnp.arange(6.0)
    logprior = lambda p: -0.5 * (p["loc"] ** 2 + jnp.sum(p["w"] ** 2))
    loglik = lambda p, d: -0.5 * (d - p["loc"] - jnp.sum(p["w"])) ** 2
    grad_est = gradients.grad_estimator(logprior, loglik, data_size=6)
    g = grad_est({"loc": jnp.array(0.1), "w": jnp.zeros(2)}, data[:3])
    assert set(g) == {"loc", "w"}
    assert g["w"].shape == (2,)
    assert np.isfinite(np.asarray(g["loc"]))


def test_control_variates_exact_at_centering_position():
    """At the centering position the CV estimator returns the FULL-data
    gradient regardless of the minibatch."""
    data, logprior, loglik = _toy_model()
    grad_est = gradients.grad_estimator(logprior, loglik, data_size=10)
    center = jnp.array(0.3)
    cv = gradients.control_variates(grad_est, center, data)
    full = grad_est(center, data)
    for batch in (data[:2], data[3:7], data[9:]):
        np.testing.assert_allclose(
            float(cv(center, batch)), float(full), rtol=RTOL_EXACT
        )


def test_control_variates_unbiased_shift():
    data, logprior, loglik = _toy_model()
    grad_est = gradients.grad_estimator(logprior, loglik, data_size=10)
    cv = gradients.control_variates(grad_est, jnp.array(0.0), data)
    # full-batch minibatch: CV must equal the plain full gradient anywhere
    x = jnp.array(1.7)
    np.testing.assert_allclose(
        float(cv(x, data)), float(grad_est(x, data)), rtol=RTOL_EXACT
    )


# ---------------------------------------------------------------------------
# kernels: state contracts and jit pins
# ---------------------------------------------------------------------------


def _grad_est():
    data, logprior, loglik = _toy_model()
    return data, gradients.grad_estimator(logprior, loglik, data_size=10)


def test_sgld_init_returns_position():
    pos = {"w": jnp.ones(3)}
    out = blackjax_tpu.sgmcmc.sgld.init(pos)
    assert out is pos


def test_sgld_top_level_jit_step(rng_key):
    data, grad_est = _grad_est()
    algo = blackjax_tpu.sgld(grad_est)
    pos = algo.init(jnp.array(1.0))
    new = jax.jit(lambda k, p: algo.step(k, p, data[:5], 1e-3))(rng_key, pos)
    assert jnp.ndim(new) == 0
    assert np.isfinite(float(new))


def test_sghmc_top_level_jit_step(rng_key):
    data, grad_est = _grad_est()
    algo = blackjax_tpu.sghmc(grad_est, num_integration_steps=5)
    pos = algo.init(jnp.array(1.0))
    new = jax.jit(lambda k, p: algo.step(k, p, data[:5], 1e-3))(rng_key, pos)
    assert np.isfinite(float(new))


def test_sgnht_state_fields_and_jit(rng_key):
    data, grad_est = _grad_est()
    algo = blackjax_tpu.sgnht(grad_est)
    state = algo.init(jnp.array(1.0), rng_key)
    assert isinstance(state, sgnht_mod.SGNHTState)
    assert hasattr(state, "position") and hasattr(state, "momentum")
    assert jnp.ndim(state.xi) == 0
    new = jax.jit(lambda k, s: algo.step(k, s, data[:5], 1e-3))(rng_key, state)
    assert isinstance(new, sgnht_mod.SGNHTState)
    assert np.isfinite(float(new.position))


def test_csgld_state_fields(rng_key):
    state = csgld_mod.init(jnp.zeros(2), num_partitions=16)
    assert state.energy_pdf.shape == (16,)
    np.testing.assert_allclose(float(state.energy_pdf.sum()), 1.0, rtol=1e-6)
    assert int(state.energy_idx) == 15
    # the init histogram is a strictly decreasing ramp (low bins favored)
    assert (np.diff(np.asarray(state.energy_pdf)) < 0).all()


def test_csgld_energy_pdf_stays_normalized(rng_key):
    """The stochastic-approximation histogram update preserves total mass."""
    data, logprior, loglik = _toy_model()
    logdensity_est = gradients.logdensity_estimator(logprior, loglik, 10)
    grad_est = gradients.grad_estimator(logprior, loglik, 10)
    algo = blackjax_tpu.csgld(
        logdensity_est, grad_est, num_partitions=32, energy_gap=5.0
    )
    state = algo.init(jnp.array(0.0))
    for i in range(20):
        state = jax.jit(algo.step)(
            jax.random.fold_in(rng_key, i), state, data[:5], 1e-4, 1e-2
        )
    np.testing.assert_allclose(float(state.energy_pdf.sum()), 1.0, rtol=1e-6)
    assert (np.asarray(state.energy_pdf) > 0).all()
    assert 0 < int(state.energy_idx) < 32


def test_csgld_bin_location_edges():
    locate = csgld_mod._locate_bin
    # below the range clamps to bin 1, above clamps to the top bin
    assert int(locate(jnp.array(-100.0), 0.0, 10.0, 16)) == 1
    assert int(locate(jnp.array(1e9), 0.0, 10.0, 16)) == 15
    assert int(locate(jnp.array(25.0), 0.0, 10.0, 16)) == 3
