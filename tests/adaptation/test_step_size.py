"""Step-size adaptation tests.

Parity model: reference ``tests/adaptation/test_step_size.py`` —
find_reasonable_step_size bracketing and dual-averaging convergence to the
target acceptance rate.
"""
import jax
import jax.numpy as jnp
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.step_size import (
    bisection_monotonic_fn,
    dual_averaging_adaptation,
    find_reasonable_step_size,
)
from blackjax_tpu.mcmc import hmc


def _logdensity(x):
    return -0.5 * jnp.sum(x**2)


def test_find_reasonable_step_size(rng_key):
    """The returned step size must put the HMC acceptance near the crossing
    target (0.65): neither tiny (always accept) nor huge (always reject)."""
    kernel = hmc.build_kernel()
    state = hmc.init(jnp.ones(4), _logdensity)

    def kernel_generator(step_size):
        return lambda key, s: kernel(
            key, s, _logdensity, step_size, jnp.ones(4), num_integration_steps=10
        )

    step_size = find_reasonable_step_size(
        rng_key, kernel_generator, state, initial_step_size=1e-4
    )
    assert 0.05 < float(step_size) < 5.0

    # the search stops at the CROSSING, so the target must be bracketed
    # within one halving: acceptance at step_size/2 exceeds the 0.65 target
    keys = jax.random.split(rng_key, 50)
    accs = []
    for k in keys:
        _, info = kernel_generator(float(step_size) / 2)(k, state)
        accs.append(float(info.acceptance_rate))
    assert sum(accs) / len(accs) > 0.65


def test_dual_averaging_converges_to_target(rng_key):
    """DA on a real HMC chain drives acceptance toward the target."""
    target = 0.8
    kernel = hmc.build_kernel()
    init_da, update_da, final_da = dual_averaging_adaptation(target=target)

    @jax.jit
    def adapt(rng_key, state):
        def one(carry, key):
            state, da_state = carry
            state, info = kernel(
                key,
                state,
                _logdensity,
                jnp.exp(da_state.log_step_size),
                jnp.ones(4),
                num_integration_steps=10,
            )
            return (state, update_da(da_state, info.acceptance_rate)), None
        (state, da_state), _ = jax.lax.scan(
            one, (state, init_da(1.0)), jax.random.split(rng_key, 500)
        )
        return state, final_da(da_state)

    state, tuned = adapt(rng_key, hmc.init(jnp.ones(4), _logdensity))
    tuned = float(tuned)
    assert 0.05 < tuned < 2.0

    @jax.jit
    def measure(rng_key, state):
        def one(state, key):
            state, info = kernel(
                key, state, _logdensity, tuned, jnp.ones(4), num_integration_steps=10
            )
            return state, info.acceptance_rate
        return jax.lax.scan(one, state, jax.random.split(rng_key, 200))

    _, accs = measure(jax.random.key(123), state)
    assert abs(float(jnp.mean(accs)) - target) < 0.12


def test_bisection_monotonic_fn():
    """The streaming bisection drives a monotone acceptance response to the
    target without an initial bracketing interval."""
    f = lambda eps: 1.0 / (1.0 + eps)  # acceptance-like decreasing map
    update = bisection_monotonic_fn(0.5, tolerance=1e-3)
    state = (jnp.array([-jnp.inf, jnp.inf]), jnp.asarray(False))
    step_size = jnp.asarray(0.01)
    for _ in range(40):
        state, step_size = update(state, step_size, f(step_size))
    assert bool(state[1])  # terminated
    assert abs(float(f(step_size)) - 0.5) < 5e-3
