"""Divergence detection: the user-facing flag that drives Stan-style
workflow decisions must fire on pathological geometry and stay silent on a
well-tuned run (reference behavior: ``trajectory.py`` divergence-transition
handling; ``test_trajectory.py:21``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu

# a narrow funnel-like scale: huge curvature mismatch across dims
NARROW = jnp.array([1.0, 1e-4])


def narrow_logdensity(x):
    return -0.5 * jnp.sum(x**2 / NARROW**2)


def _run(algo, state, rng_key, n=100):
    infos = []
    step = jax.jit(algo.step)
    for i in range(n):
        state, info = step(jax.random.fold_in(rng_key, i), state)
        infos.append(info)
    return state, infos


def test_hmc_flags_divergences_on_oversized_steps(rng_key):
    algo = blackjax_tpu.hmc(
        narrow_logdensity,
        step_size=0.5,  # 5000x the narrow scale: guaranteed blowup
        inverse_mass_matrix=jnp.ones(2),
        num_integration_steps=10,
    )
    state, infos = _run(algo, algo.init(jnp.array([0.5, 5e-5])), rng_key)
    divergent = np.array([bool(i.is_divergent) for i in infos])
    assert divergent.mean() > 0.5
    # divergent proposals are rejected: the chain never leaves finite land
    assert np.isfinite(np.asarray(state.position)).all()
    assert np.isfinite(float(state.logdensity))


def test_nuts_truncates_divergent_trajectories(rng_key):
    algo = blackjax_tpu.nuts(
        narrow_logdensity, step_size=0.5, inverse_mass_matrix=jnp.ones(2)
    )
    state, infos = _run(algo, algo.init(jnp.array([0.5, 5e-5])), rng_key)
    divergent = np.array([bool(i.is_divergent) for i in infos])
    expansions = np.array([int(i.num_trajectory_expansions) for i in infos])
    assert divergent.mean() > 0.5
    # a divergence stops doubling immediately: tiny trees on those steps
    assert expansions[divergent].max() <= 2
    assert np.isfinite(np.asarray(state.position)).all()


def test_no_divergences_when_well_tuned(rng_key):
    algo = blackjax_tpu.nuts(
        narrow_logdensity, step_size=5e-5, inverse_mass_matrix=NARROW**2
    )
    state, infos = _run(algo, algo.init(jnp.array([0.5, 5e-5])), rng_key, n=50)
    assert not any(bool(i.is_divergent) for i in infos)
    accept = np.mean([float(i.acceptance_rate) for i in infos])
    assert accept > 0.7


def test_divergence_threshold_is_respected(rng_key):
    """A looser divergence_threshold turns flags off for the same moves."""
    tight = blackjax_tpu.hmc(
        narrow_logdensity,
        step_size=2e-4,
        inverse_mass_matrix=jnp.ones(2),
        num_integration_steps=5,
        divergence_threshold=0.01,  # absurdly tight: everything "diverges"
    )
    state, infos = _run(tight, tight.init(jnp.array([0.5, 5e-5])), rng_key, n=30)
    assert np.mean([bool(i.is_divergent) for i in infos]) > 0.5
