"""SMC: resampling statistics, ESS solver, tempered + adaptive tempered
end-to-end with moment recovery, waste-free variant, inner kernel tuning."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.smc import adaptive_tempered, base, ess, resampling, solver, tempered
from blackjax_tpu.smc.base import extend_params
from blackjax_tpu.smc.tuning.from_particles import (
    inverse_mass_matrix_from_particles,
    particles_stds,
)
from blackjax_tpu.smc.waste_free import waste_free_smc


@pytest.mark.parametrize(
    "scheme", [resampling.systematic, resampling.stratified, resampling.multinomial,
               resampling.residual]
)
def test_resampling_is_unbiased(scheme, rng_key):
    n = 1000
    weights = jax.random.dirichlet(rng_key, jnp.ones(n) * 0.3)
    keys = jax.random.split(rng_key, 200)
    idx = jax.vmap(lambda k: scheme(k, weights, n))(keys)
    counts = np.bincount(np.asarray(idx).ravel(), minlength=n) / (200 * n)
    np.testing.assert_allclose(counts, np.asarray(weights), atol=2e-3)


def test_log_ess():
    w = jnp.log(jnp.ones(100) / 100)
    np.testing.assert_allclose(float(ess.ess(w)), 100.0, rtol=1e-6)
    # degenerate weights -> ESS 1
    w = jnp.log(jnp.concatenate([jnp.ones(1), jnp.full(99, 1e-30)]))
    np.testing.assert_allclose(float(ess.ess(w)), 1.0, rtol=1e-3)


def test_dichotomy_solver():
    f = lambda x: 2.0 - x  # root at 2
    root = solver.dichotomy(f, 0.0, 10.0)
    np.testing.assert_allclose(float(root), 2.0, atol=1e-3)
    # feasible whole interval
    assert float(solver.dichotomy(f, 0.0, 1.0)) == 1.0
    # no root in the interval (f negative everywhere): NaN sentinel
    assert np.isnan(float(solver.dichotomy(lambda x: -1.0 - x, 0.0, 1.0)))
    # the returned left endpoint always has f >= 0 (tempering never
    # overshoots the target ESS)
    g = lambda x: 3.7 - x
    r = solver.dichotomy(g, 0.0, 10.0)
    assert float(g(r)) >= 0.0
    # jit-compatible (it runs inside the tempering step)
    r_jit = jax.jit(lambda: solver.dichotomy(f, 0.0, 10.0))()
    np.testing.assert_allclose(float(r_jit), float(root), rtol=1e-12)


def test_ess_solver_sign_contract():
    """ess_solver must target delta*loglik with the same sign as the weight
    update: on an asymmetric log-likelihood the returned increment gives
    exactly the target ESS under delta*loglik (a flipped sign would not)."""
    from blackjax_tpu.smc.ess import ess, ess_solver, log_ess

    loglik_vals = jnp.concatenate([jnp.zeros(900), -20.0 * jnp.ones(100)])
    target = 0.93  # only reachable with the correct sign
    delta = ess_solver(
        lambda x: x, loglik_vals, target, 1.0, solver.dichotomy
    )
    achieved = float(ess(delta * loglik_vals)) / loglik_vals.shape[0]
    np.testing.assert_allclose(achieved, target, rtol=1e-3)


def _gaussian_model(dim=2):
    loc = jnp.array([0.5, -0.5])
    logprior = lambda x: -0.5 * jnp.sum(x**2) / 4.0
    loglik = lambda x: -0.5 * jnp.sum((x - loc) ** 2 / 0.5)
    # posterior: precision 1/4 + 2 = 2.25, mean = 2*loc/2.25
    post_var = 1.0 / (1.0 / 4.0 + 2.0)
    post_mean = 2.0 * loc * post_var
    return logprior, loglik, post_mean, post_var


def _hmc_params(dim=2):
    return extend_params(
        {
            "step_size": 0.3,
            "inverse_mass_matrix": jnp.eye(dim),
            "num_integration_steps": 10,
        }
    )


def test_adaptive_tempered_smc_posterior_recovery(rng_key):
    logprior, loglik, post_mean, post_var = _gaussian_model()
    n_particles = 2000

    algo = blackjax_tpu.adaptive_tempered_smc(
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        _hmc_params(),
        resampling.systematic,
        target_ess=0.75,
        num_mcmc_steps=4,
    )
    init_key, run_key = jax.random.split(rng_key)
    particles = 2.0 * jax.random.normal(init_key, (n_particles, 2))
    state = algo.init(particles)

    @jax.jit
    def one_step(carry, _):
        key, state = carry
        key, subkey = jax.random.split(key)
        state, info = algo.step(subkey, state)
        return (key, state), (state.tempering_param, info.log_likelihood_increment)

    def cond(carry):
        (key, state), _ = carry
        return state.tempering_param < 1.0

    carry = (run_key, state)
    n_steps = 0
    log_z = 0.0
    while float(carry[1].tempering_param) < 1.0 and n_steps < 50:
        carry, (lam, incr) = one_step(carry, None)
        log_z += float(incr)
        n_steps += 1
    final = carry[1]
    assert float(final.tempering_param) == 1.0
    mean = np.average(np.asarray(final.particles), axis=0, weights=np.asarray(final.weights))
    np.testing.assert_allclose(mean, np.asarray(post_mean), atol=0.1)
    assert 1 < n_steps < 50


def test_tempered_smc_fixed_schedule(rng_key):
    logprior, loglik, post_mean, post_var = _gaussian_model()
    n_particles = 1000
    algo = blackjax_tpu.tempered_smc(
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        _hmc_params(),
        resampling.systematic,
        num_mcmc_steps=4,
    )
    init_key, run_key = jax.random.split(rng_key)
    particles = 2.0 * jax.random.normal(init_key, (n_particles, 2))
    state = algo.init(particles)
    schedule = jnp.linspace(0.1, 1.0, 8)

    def body(carry, lam):
        key, state = carry
        key, subkey = jax.random.split(key)
        state, info = algo.step(subkey, state, lam)
        return (key, state), info.log_likelihood_increment

    (_, final), increments = jax.lax.scan(body, (run_key, state), schedule)
    var = np.average(
        (np.asarray(final.particles) - np.average(final.particles, axis=0, weights=np.asarray(final.weights))) ** 2,
        axis=0,
        weights=np.asarray(final.weights),
    )
    np.testing.assert_allclose(var, post_var * np.ones(2), rtol=0.35)


def test_waste_free_update(rng_key):
    logprior, loglik, *_ = _gaussian_model()
    n_particles, p = 200, 4
    algo = blackjax_tpu.tempered_smc(
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        _hmc_params(),
        resampling.systematic,
        num_mcmc_steps=None,
        update_strategy=waste_free_smc(n_particles, p),
    )
    particles = jax.random.normal(rng_key, (n_particles, 2))
    state = algo.init(particles)
    new_state, info = jax.jit(algo.step)(rng_key, state, 0.5)
    assert new_state.particles.shape == (n_particles, 2)


def test_inner_kernel_tuning_updates_parameters(rng_key):
    logprior, loglik, *_ = _gaussian_model()
    n_particles = 300

    def parameter_update(key, state, info):
        return extend_params(
            {
                "step_size": 0.3,
                "inverse_mass_matrix": inverse_mass_matrix_from_particles(
                    state.particles
                ),
                "num_integration_steps": 10,
            }
        )

    algo = blackjax_tpu.inner_kernel_tuning(
        adaptive_tempered.as_top_level_api,
        logprior,
        loglik,
        blackjax_tpu.hmc.build_kernel(),
        blackjax_tpu.hmc.init,
        resampling.systematic,
        mcmc_parameter_update_fn=parameter_update,
        initial_parameter_value=_hmc_params(),
        num_mcmc_steps=2,
        target_ess=0.7,
    )
    particles = jax.random.normal(rng_key, (n_particles, 2))
    state = algo.init(particles)
    new_state, info = jax.jit(algo.step)(rng_key, state)
    imm = new_state.parameter_override["inverse_mass_matrix"]
    assert imm.shape == (1, 2, 2)
    assert not np.allclose(np.asarray(imm[0]), np.eye(2))


def test_update_scale_from_acceptance_rate():
    from blackjax_tpu.smc.tuning.from_kernel_info import update_scale_from_acceptance_rate

    scales = jnp.array([0.5, 0.5])
    rates = jnp.array([0.1, 0.5])
    new = update_scale_from_acceptance_rate(scales, rates)
    assert float(new[0]) < float(new[1])


def test_partial_posteriors_data_tempering(rng_key):
    """Data tempering: annealing in observations converges to the full
    posterior of a conjugate Gaussian-mean model."""
    import blackjax_tpu
    from blackjax_tpu.smc import resampling

    n_data, n_particles = 64, 512
    data_key, init_key, run_key = jax.random.split(rng_key, 3)
    data = 2.0 + jax.random.normal(data_key, (n_data,))

    def partial_logposterior_factory(data_mask):
        def logposterior(theta):
            loglik = -0.5 * (data - theta) ** 2
            return -0.5 * theta**2 + jnp.sum(loglik * data_mask)
        return jax.jit(logposterior)

    algo = blackjax_tpu.partial_posteriors_smc(
        blackjax_tpu.mala.build_kernel(),
        blackjax_tpu.mala.init,
        {"step_size": 0.2 * jnp.ones(1)},  # leading dim 1 = shared
        resampling.systematic,
        num_mcmc_steps=10,
        partial_logposterior_factory=partial_logposterior_factory,
    )
    particles = jax.random.normal(init_key, (n_particles,)) * 3.0
    state = algo.init(particles, n_data)

    # anneal: unmask 8 more observations per step
    n_steps = n_data // 8
    for i in range(n_steps):
        mask = (jnp.arange(n_data) < 8 * (i + 1)).astype(jnp.float32)
        state, info = algo.step(jax.random.fold_in(run_key, i), state, mask)

    # conjugate posterior: mean = sum(y)/(n+1), var = 1/(n+1)
    post_mean = float(jnp.sum(data) / (n_data + 1))
    post_var = 1.0 / (n_data + 1)
    est_mean = float(jnp.average(state.particles, weights=state.weights))
    est_var = float(
        jnp.average((state.particles - est_mean) ** 2, weights=state.weights)
    )
    assert abs(est_mean - post_mean) < 0.15
    assert abs(est_var - post_var) < post_var  # same order of magnitude
