"""Multinomial-HMC contract tests.

Scenario parity target: ``/root/reference/tests/mcmc/test_multinomial_hmc.py``
(interface, is_accepted semantics, explicit-build_proposal equivalence,
divergence detection, pytree positions, the dynamic variant).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import dynamic_hmc as dynamic_hmc_mod
from blackjax_tpu.mcmc import hmc as hmc_mod

_SCALES = jnp.array([1.0, 2.0, 0.5])


def _logdensity(x):
    return -0.5 * jnp.sum((x / _SCALES) ** 2)


def _run(algo, rng_key, init_position, num_steps=200):
    state = algo.init(init_position)

    def step(state, key):
        state, info = algo.step(key, state)
        return state, (state, info)

    return jax.lax.scan(step, state, jax.random.split(rng_key, num_steps))[1]


def test_is_accepted_identically_true(rng_key):
    """Progressive multinomial selection has no rejection step: every
    transition reports is_accepted=True while acceptance_rate stays the
    MH-average diagnostic in (0, 1]."""
    algo = blackjax_tpu.mhmc(
        _logdensity, step_size=0.5, inverse_mass_matrix=jnp.ones(3), num_integration_steps=8
    )
    _, infos = _run(algo, rng_key, jnp.ones(3))
    assert bool(jnp.all(infos.is_accepted))
    acc = float(jnp.mean(infos.acceptance_rate))
    assert 0.0 < acc <= 1.0


def test_alias_and_explicit_proposal_bit_identical(rng_key):
    """blackjax_tpu.mhmc == hmc with build_proposal=multinomial_hmc_proposal,
    and the multinomial_hmc alias is the same object."""
    assert blackjax_tpu.multinomial_hmc is blackjax_tpu.mhmc
    params = dict(step_size=0.5, inverse_mass_matrix=jnp.ones(3), num_integration_steps=8)
    via_alias = blackjax_tpu.mhmc(_logdensity, **params)
    via_seam = blackjax_tpu.hmc(
        _logdensity, **params, build_proposal=hmc_mod.multinomial_hmc_proposal
    )
    states_a, _ = _run(via_alias, rng_key, jnp.ones(3), num_steps=50)
    states_b, _ = _run(via_seam, rng_key, jnp.ones(3), num_steps=50)
    np.testing.assert_array_equal(states_a.position, states_b.position)


def test_moment_recovery(rng_key):
    algo = blackjax_tpu.mhmc(
        _logdensity,
        step_size=0.4,
        num_integration_steps=16,
        inverse_mass_matrix=_SCALES**2,
    )
    states, _ = _run(algo, rng_key, jnp.zeros(3), num_steps=3000)
    np.testing.assert_allclose(
        jnp.std(states.position, axis=0), _SCALES, rtol=0.25
    )


def test_divergence_detection(rng_key):
    """A grossly oversized step reports divergence (energy blowup)."""
    algo = blackjax_tpu.mhmc(
        _logdensity, step_size=50.0, inverse_mass_matrix=jnp.ones(3), num_integration_steps=8
    )
    _, infos = _run(algo, rng_key, 5.0 * jnp.ones(3), num_steps=50)
    assert bool(jnp.any(infos.is_divergent))


def test_pytree_position(rng_key):
    def logdensity(tree):
        return _logdensity(tree["a"]) - 0.5 * jnp.sum(tree["b"] ** 2)

    algo = blackjax_tpu.mhmc(
        logdensity,
        step_size=0.4,
        inverse_mass_matrix=jnp.ones(7),
        num_integration_steps=8,
    )
    init = {"a": jnp.ones(3), "b": jnp.zeros((2, 2))}
    states, infos = _run(algo, rng_key, init, num_steps=100)
    assert states.position["a"].shape == (100, 3)
    assert states.position["b"].shape == (100, 2, 2)
    assert bool(jnp.all(jnp.isfinite(infos.energy)))


def test_dynamic_variant_draws_varying_lengths(rng_key):
    """dmhmc: per-step random trajectory lengths + multinomial selection;
    is_accepted stays identically True and the state carries the generator
    argument (DynamicHMCState contract)."""
    algo = blackjax_tpu.dmhmc(
        _logdensity,
        step_size=0.4,
        inverse_mass_matrix=jnp.ones(3),
        integration_steps_fn=lambda key: 1 + jax.random.randint(key, (), 0, 8),
    )
    state = algo.init(jnp.ones(3), jax.random.key(0))
    assert hasattr(state, "random_generator_arg")

    def step(state, key):
        state, info = algo.step(key, state)
        return state, (info.num_integration_steps, info.is_accepted)

    _, (lengths, accepted) = jax.lax.scan(
        step, state, jax.random.split(rng_key, 100)
    )
    assert bool(jnp.all(accepted))
    assert len(np.unique(np.asarray(lengths))) > 1


def test_dmhmc_matches_explicit_build_proposal(rng_key):
    params = dict(
        step_size=0.4,
        inverse_mass_matrix=jnp.ones(3),
        integration_steps_fn=lambda key: 1 + jax.random.randint(key, (), 0, 4),
    )
    a = blackjax_tpu.dmhmc(_logdensity, **params)
    b = blackjax_tpu.dynamic_hmc(
        _logdensity, **params, build_proposal=hmc_mod.multinomial_hmc_proposal
    )
    keys = jax.random.split(rng_key, 25)

    def run(algo):
        def step(state, key):
            state, _ = algo.step(key, state)
            return state, None

        init = algo.init(jnp.ones(3), jax.random.key(0))
        return jax.lax.scan(step, init, keys)[0]

    np.testing.assert_array_equal(run(a).position, run(b).position)
