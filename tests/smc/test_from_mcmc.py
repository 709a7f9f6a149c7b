"""The MCMC→SMC bridge: shared-vs-unshared parameter split and the
particle-update kernel it produces.

Scenario parity target: ``tests/smc/test_from_mcmc.py`` in the reference
suite (UnsharedParametersTest, BuildKernelTest).
"""
import jax
import jax.numpy as jnp
import numpy as np

import blackjax_tpu
from blackjax_tpu.smc import resampling
from blackjax_tpu.smc.base import SMCState
from blackjax_tpu.smc.from_mcmc import build_kernel, unshared_parameters_and_step_fn

# ---------------------------------------------------------------------------
# unshared_parameters_and_step_fn: the length-1-leading-axis convention
# ---------------------------------------------------------------------------


def _recording_step(rng_key, state, logdensity_fn=None, **params):
    """Fake MCMC step that records the keyword parameters it was bound with."""
    return params


def test_shared_parameter_removed_from_unshared():
    params = {
        "step_size": jnp.ones((1,)) * 0.1,  # shared (leading axis 1)
        "imm": jnp.ones((100, 2)),  # per-particle
    }
    unshared, _ = unshared_parameters_and_step_fn(params, _recording_step)
    assert "step_size" not in unshared
    assert "imm" in unshared


def test_unshared_parameter_shape_preserved():
    params = {"imm": jnp.arange(200.0).reshape(100, 2)}
    unshared, _ = unshared_parameters_and_step_fn(params, _recording_step)
    np.testing.assert_allclose(unshared["imm"], params["imm"])


def test_shared_parameter_bound_into_step_fn():
    params = {"step_size": jnp.full((1, 3), 0.1), "imm": jnp.ones((100, 2))}
    _, step = unshared_parameters_and_step_fn(params, _recording_step)
    seen = step(None, None)
    # the leading length-1 axis is stripped before binding
    assert seen["step_size"].shape == (3,)
    np.testing.assert_allclose(seen["step_size"], 0.1)
    assert "imm" not in seen


def test_all_parameters_shared():
    params = {"a": jnp.ones((1,)), "b": jnp.zeros((1, 4))}
    unshared, step = unshared_parameters_and_step_fn(params, _recording_step)
    assert unshared == {}
    seen = step(None, None)
    assert set(seen) == {"a", "b"}


def test_all_parameters_unshared():
    params = {"a": jnp.ones((7,)), "b": jnp.zeros((7, 4))}
    unshared, step = unshared_parameters_and_step_fn(params, _recording_step)
    assert set(unshared) == {"a", "b"}
    assert step(None, None) == {}


# ---------------------------------------------------------------------------
# build_kernel: one full particle-update step through a real MCMC kernel
# ---------------------------------------------------------------------------


def _setup(rng_key, n_particles=300):
    logposterior = lambda x: -0.5 * jnp.sum((x - 1.0) ** 2)
    log_weights = lambda x: -0.5 * jnp.sum(x**2)
    particles = 3.0 + jax.random.normal(rng_key, (n_particles, 2))
    state = SMCState(particles, jnp.full((n_particles,), 1.0 / n_particles), {})
    step = build_kernel(
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
    )
    params = {
        "step_size": jnp.full((1,), 0.3),
        "inverse_mass_matrix": jnp.tile(jnp.eye(2)[None], (1, 1, 1)).reshape(1, 2, 2),
        "num_integration_steps": jnp.full((1,), 8, dtype=int),
    }
    return step, state, params, logposterior, log_weights


def test_step_returns_smc_state_and_info(rng_key):
    step, state, params, logpost, logw = _setup(rng_key)
    new_state, info = step(rng_key, state, 5, params, logpost, logw)
    assert isinstance(new_state, SMCState)
    assert new_state.particles.shape == state.particles.shape
    # normalized weights out
    np.testing.assert_allclose(float(jnp.sum(new_state.weights)), 1.0, rtol=1e-6)
    # info carries the resampling ancestry and the normalizing increment
    assert info.ancestors.shape == (state.particles.shape[0],)
    assert np.isfinite(float(info.log_likelihood_increment))


def test_particles_move_toward_the_mutation_target(rng_key):
    step, state, params, logpost, logw = _setup(rng_key)
    new_state, _ = step(rng_key, state, 10, params, logpost, logw)
    # particles start at mean 3; ten HMC mutations against N(1, I) must pull
    # the cloud mean strictly toward 1
    old_mean = float(jnp.mean(state.particles))
    new_mean = float(jnp.mean(new_state.particles))
    assert abs(new_mean - 1.0) < abs(old_mean - 1.0)
    assert not np.allclose(np.asarray(new_state.particles), np.asarray(state.particles))


def test_kernel_is_jittable_with_static_num_steps(rng_key):
    step, state, params, logpost, logw = _setup(rng_key)
    jitted = jax.jit(lambda k, s: step(k, s, 5, params, logpost, logw))
    eager_state, _ = step(rng_key, state, 5, params, logpost, logw)
    jit_state, _ = jitted(rng_key, state)
    np.testing.assert_allclose(
        np.asarray(jit_state.particles), np.asarray(eager_state.particles), rtol=1e-10
    )


def test_per_particle_parameters_are_vmapped(rng_key):
    """A per-particle step size must give different mutations per particle;
    binding it shared must give the single-scale behavior."""
    logposterior = lambda x: -0.5 * jnp.sum(x**2)
    log_weights = lambda x: jnp.zeros(())
    n = 128
    particles = jax.random.normal(rng_key, (n, 1))
    state = SMCState(particles, jnp.full((n,), 1.0 / n), {})
    step = build_kernel(
        blackjax_tpu.mala.build_kernel(), blackjax_tpu.mala.init, resampling.systematic
    )
    # half the particles get a (near-)zero step size: their mutation proposals
    # cannot move; the other half move almost surely
    step_sizes = jnp.concatenate([jnp.full((n // 2,), 1e-12), jnp.full((n // 2,), 0.5)])
    new_state, info = step(
        rng_key, state, 3, {"step_size": step_sizes}, logposterior, log_weights
    )
    # uniform weights -> systematic resampling keeps ancestry ordered, so the
    # first half of the output corresponds to frozen-step particles
    ancestors = np.asarray(info.ancestors)
    frozen = ancestors < n // 2
    moved = np.abs(
        np.asarray(new_state.particles[:, 0]) - np.asarray(particles[ancestors, 0])
    )
    # noise scale is sqrt(2*step) per move: 3 moves at 1e-12 stay under 1e-4
    assert moved[frozen].max() < 1e-4
    assert np.median(moved[~frozen]) > 1e-2
