"""Nested sampling through the reject-constrained MCMC bridge.

Covers the ``ns.from_mcmc.reject_constrained_step`` path — a random-walk
inner kernel that cannot gate the likelihood contour inside its proposal —
end to end: the propose-then-reject contract, adaptive scale retuning from
the live set, and analytic evidence recovery. Scenario parity target:
``/root/reference/tests/ns/test_nested_sampling.py`` (the
reject-constrained RW evidence and narrow-prior evidence cases).
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import random_walk
from blackjax_tpu.ns import adaptive as ns_adaptive
from blackjax_tpu.ns import from_mcmc as ns_from_mcmc
from blackjax_tpu.ns import utils as ns_utils
from blackjax_tpu.ns.base import init_state_strategy
from blackjax_tpu.smc.tuning.from_particles import particles_stds

D = 2


def _gaussian_pair(sigma_pi, sigma_l, mu):
    mu = jnp.asarray(mu)

    def logprior(x):
        return -0.5 * jnp.sum(x**2) / sigma_pi**2 - 0.5 * D * jnp.log(
            2 * jnp.pi * sigma_pi**2
        )

    def loglik(x):
        return -0.5 * jnp.sum((x - mu) ** 2) / sigma_l**2 - 0.5 * D * jnp.log(
            2 * jnp.pi * sigma_l**2
        )

    true_logz = float(
        -0.5 * jnp.sum(mu**2) / (sigma_pi**2 + sigma_l**2)
        - 0.5 * D * jnp.log(2 * jnp.pi * (sigma_pi**2 + sigma_l**2))
    )
    return logprior, loglik, true_logz


def _build_rw_ns(logprior, loglik, num_delete, num_inner_steps):
    """NS whose inner kernel is an additive-step random walk wrapped by the
    propose-then-reject contour gate, with the step scale retuned each outer
    step from the live-point spread."""
    init_state_fn = partial(
        init_state_strategy, logprior_fn=logprior, loglikelihood_fn=loglik
    )
    additive = random_walk.build_additive_step()

    def rw_step(rng_key, state, logdensity_fn, sigma):
        return additive(rng_key, state, logdensity_fn, random_walk.normal(sigma))

    constrained_step = ns_from_mcmc.reject_constrained_step(
        init_state_fn, logprior, random_walk.init, rw_step
    )

    def retune(rng_key, state, info, params):
        del rng_key, info, params
        return {"sigma": 0.5 * particles_stds(state.particles.position)}

    kernel = ns_from_mcmc.build_kernel(
        constrained_step, num_inner_steps, retune, num_delete=num_delete
    )

    def init_fn(positions, rng_key=None):
        return ns_adaptive.init(
            positions,
            init_state_fn=jax.vmap(init_state_fn),
            update_inner_kernel_params_fn=retune,
            rng_key=rng_key,
        )

    return init_fn, kernel


def test_reject_constrained_step_contract(rng_key):
    """A proposal outside the contour must be rejected even when the MCMC
    kernel accepts it; inside the contour the MCMC verdict decides."""
    logprior, loglik, _ = _gaussian_pair(2.0, 0.5, [0.5, -0.3])
    init_state_fn = partial(
        init_state_strategy, logprior_fn=logprior, loglikelihood_fn=loglik
    )
    additive = random_walk.build_additive_step()

    def rw_step(rng_key, state, logdensity_fn, sigma):
        return additive(rng_key, state, logdensity_fn, random_walk.normal(sigma))

    step = ns_from_mcmc.reject_constrained_step(
        init_state_fn, logprior, random_walk.init, rw_step
    )

    start = init_state_fn(jnp.array([0.5, -0.3]))  # at the likelihood mode

    # an impossible contour (above the likelihood maximum): every proposal is
    # outside, so the state must never move
    state = start
    ll_max = float(loglik(jnp.array([0.5, -0.3])))
    for i in range(20):
        state, info = step(
            jax.random.fold_in(rng_key, i), state, ll_max + 1.0, sigma=jnp.ones(D)
        )
        assert not bool(info.is_accepted)
    np.testing.assert_array_equal(
        np.asarray(state.position), np.asarray(start.position)
    )

    # a contour that is satisfied everywhere nearby: acceptance now follows
    # the RW kernel, and accepted moves record the birth contour
    moved, n_acc = start, 0
    for i in range(50):
        moved, info = step(
            jax.random.fold_in(rng_key, 1000 + i), moved, -1e6, sigma=jnp.ones(D)
        )
        n_acc += int(bool(info.is_accepted))
    assert n_acc > 0
    assert float(moved.loglikelihood_birth) == -1e6


def test_reject_constrained_rw_evidence(rng_key):
    """Full NS run with the reject-constrained RW kernel recovers the
    analytic Gaussian-Gaussian evidence."""
    logprior, loglik, true_logz = _gaussian_pair(2.0, 0.5, [0.5, -0.3])
    init_fn, kernel = _build_rw_ns(
        logprior, loglik, num_delete=20, num_inner_steps=15
    )

    init_key, run_key = jax.random.split(rng_key)
    positions = 2.0 * jax.random.normal(init_key, (400, D))
    state = init_fn(positions, rng_key=init_key)

    step = jax.jit(kernel)
    dead = []
    for _ in range(120):
        run_key, subkey = jax.random.split(run_key)
        state, info = step(subkey, state)
        dead.append(info)

    logz = float(jnp.logaddexp(state.integrator.logZ, state.integrator.logZ_live))
    # RW mixes worse than the slice family inside a hard contour; the gate
    # is correspondingly looser than the NSS 0.35
    assert abs(logz - true_logz) < 0.6, (logz, true_logz)

    # live set must have contracted toward the likelihood mode
    live_mean = np.asarray(state.particles.position).mean(0)
    np.testing.assert_allclose(live_mean, [0.5, -0.3], atol=0.25)

    # retuned scale must have contracted with the live set
    assert float(state.inner_kernel_params["sigma"].max()) < 1.0


def test_nss_narrow_prior_evidence(rng_key):
    """Evidence recovery when the prior is much narrower than the
    likelihood — the regime where the posterior is prior-dominated and the
    evidence is close to the likelihood height at the prior mode."""
    logprior, loglik, true_logz = _gaussian_pair(0.3, 2.0, [1.0, 0.5])
    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=5, num_delete=10)

    init_key, run_key = jax.random.split(rng_key)
    positions = 0.3 * jax.random.normal(init_key, (300, D))
    state = algo.init(positions, rng_key=init_key)

    step = jax.jit(algo.step)
    for _ in range(100):
        run_key, subkey = jax.random.split(run_key)
        state, _ = step(subkey, state)

    logz = float(jnp.logaddexp(state.integrator.logZ, state.integrator.logZ_live))
    assert abs(logz - true_logz) < 0.35, (logz, true_logz)


@pytest.mark.slow
def test_reject_constrained_rw_posterior(rng_key):
    """The dead-set posterior from the RW-constrained run matches the
    analytic Gaussian posterior mean."""
    logprior, loglik, _ = _gaussian_pair(2.0, 0.5, [0.5, -0.3])
    post_var = 1.0 / (1.0 / 2.0**2 + 1.0 / 0.5**2)
    post_mean = np.array([0.5, -0.3]) * post_var / 0.5**2

    init_fn, kernel = _build_rw_ns(
        logprior, loglik, num_delete=20, num_inner_steps=15
    )
    init_key, run_key = jax.random.split(rng_key)
    positions = 2.0 * jax.random.normal(init_key, (400, D))
    state = init_fn(positions, rng_key=init_key)

    step = jax.jit(kernel)
    dead = []
    for _ in range(120):
        run_key, subkey = jax.random.split(run_key)
        state, info = step(subkey, state)
        dead.append(info)

    final = ns_utils.finalise(state, dead)
    samples = ns_utils.sample(rng_key, final, 2000)
    np.testing.assert_allclose(
        np.asarray(samples.position).mean(0), post_mean, atol=0.12
    )
