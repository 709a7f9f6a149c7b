"""Adjusted-MCLMC tuner breadth: the pinned L/step ratio across targets,
drawn-step distribution through the dynamic kernel, and high-dimension
no-collapse guards.

Scenario parity target: the reference's
``tests/adaptation/test_adjusted_mclmc_adaptation.py`` (ratio-vs-target,
dynamic median steps, high-d collapse suite).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import adjusted_mclmc as adjusted_mclmc_mod


def _target(d):
    scales = jnp.linspace(0.5, 3.0, d)
    return lambda x: -0.5 * jnp.sum((x / scales) ** 2)


def _tune(rng_key, d, num_steps=2000, **kwargs):
    logdensity = _target(d)
    kernel = adjusted_mclmc_mod.build_kernel()
    state = adjusted_mclmc_mod.init(jnp.ones(d), logdensity)
    return blackjax_tpu.adjusted_mclmc_find_L_and_step_size(
        mclmc_kernel=kernel,
        logdensity_fn=logdensity,
        num_steps=num_steps,
        state=state,
        rng_key=rng_key,
        target=0.9,
        **kwargs,
    )


@pytest.mark.parametrize("ratio", [1.5, 3.0])
def test_tuner_pins_L_to_target_ratio(rng_key, ratio):
    """``target_num_integration_steps`` IS the returned L/step ratio — the
    tuner re-pins L after every DA pass (exact invariant, not approximate)."""
    _, params, _ = _tune(rng_key, 10, target_num_integration_steps=ratio)
    np.testing.assert_allclose(
        float(params.L), ratio * float(params.step_size), rtol=1e-6
    )


def test_larger_target_ratio_gives_smaller_step(rng_key):
    """Longer trajectories accumulate more error per proposal, so hitting
    the same acceptance target needs a smaller step size."""
    _, p2, _ = _tune(rng_key, 10, target_num_integration_steps=2.0)
    _, p4, _ = _tune(rng_key, 10, target_num_integration_steps=4.0)
    assert float(p4.step_size) < float(p2.step_size)


def test_dynamic_kernel_draws_steps_around_target(rng_key):
    """Feeding the tuned (L, step) into the DYNAMIC kernel draws per-
    transition integration-step counts whose mean tracks L/step = 2."""
    d = 10
    logdensity = _target(d)
    tune_key, run_key, init_key = jax.random.split(rng_key, 3)
    _, params, _ = _tune(tune_key, d)

    from blackjax_tpu.mcmc.adjusted_mclmc_dynamic import (
        make_random_trajectory_length_fn,
    )

    algo = blackjax_tpu.adjusted_mclmc_dynamic(
        logdensity,
        step_size=float(params.step_size),
        L_proposal_factor=jnp.inf,
        inverse_mass_matrix=params.inverse_mass_matrix,
        integration_steps_fn=make_random_trajectory_length_fn(True),
        integration_steps_params=(float(params.L) / float(params.step_size),),
    )
    state = algo.init(jnp.ones(d), init_key)

    def step(s, key):
        s, info = algo.step(key, s)
        return s, info.num_integration_steps

    _, counts = jax.lax.scan(step, state, jax.random.split(run_key, 300))
    mean_steps = float(jnp.mean(counts))
    assert 1.0 <= mean_steps <= 3.5, mean_steps
    assert int(jnp.median(counts)) in (1, 2, 3)


@pytest.mark.parametrize("d", [100, 300])
def test_high_dimension_no_step_collapse(rng_key, d):
    """The two-pass DA must not collapse the step size in high dimension
    (the reference's d=10..500 regression suite): the tuned step stays
    usable and the adjusted kernel accepts at a healthy rate."""
    logdensity = _target(d)
    kernel = adjusted_mclmc_mod.build_kernel()
    tune_key, run_key = jax.random.split(rng_key)
    state = adjusted_mclmc_mod.init(jnp.ones(d), logdensity)
    state, params, _ = blackjax_tpu.adjusted_mclmc_find_L_and_step_size(
        mclmc_kernel=kernel,
        logdensity_fn=logdensity,
        num_steps=2000,
        state=state,
        rng_key=tune_key,
        target=0.9,
    )
    assert float(params.step_size) > 1e-3
    assert np.isfinite(float(params.L))

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

    _, acc = jax.lax.scan(step, state, jax.random.split(run_key, 300))
    assert 0.5 < float(jnp.mean(acc)) <= 1.0
