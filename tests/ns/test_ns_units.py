"""Nested-sampling unit breadth: init contracts, step consistency across
deletion batch sizes, the post-processing utility algebra, and top-level
construction seams.

Scenario parity target: the reference's ``tests/ns/test_nested_sampling.py``
(base init, step consistency, utils statistical properties, finalise/sample,
uniform-prior evidence, API seams).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.base import SamplingAlgorithm
from blackjax_tpu.ns import base as ns_base
from blackjax_tpu.ns import utils as ns_utils
from blackjax_tpu.ns.base import NSInfo, NSState, StateWithLogLikelihood

# exactness pins run in both precision passes: full precision under x64,
# f32 rounding (~1e-7 relative) otherwise
import jax as _jax
_X64 = _jax.config.jax_enable_x64
RTOL_EXACT = 1e-10 if _X64 else 5e-6



def _gaussian_pair():
    logprior = lambda x: -0.5 * jnp.sum(x**2 / 4.0) - jnp.log(2 * jnp.pi * 4.0)
    loglik = lambda x: -0.5 * jnp.sum((x - 0.5) ** 2)
    return logprior, loglik


# ---------------------------------------------------------------------------
# base contracts
# ---------------------------------------------------------------------------


def test_init_state_strategy_fields(rng_key):
    logprior, loglik = _gaussian_pair()
    positions = jax.random.normal(rng_key, (50, 2))
    particles = jax.vmap(
        lambda p: ns_base.init_state_strategy(p, logprior, loglik)
    )(positions)
    assert particles.position.shape == (50, 2)
    assert particles.loglikelihood.shape == (50,)
    np.testing.assert_allclose(
        np.asarray(particles.logdensity),
        np.asarray(jax.vmap(logprior)(positions)),
        rtol=1e-10,
    )
    # birth contours default to NaN (born from the prior, no constraint)
    assert np.isnan(np.asarray(particles.loglikelihood_birth)).all()


def test_init_overrides_birth_contour(rng_key):
    logprior, loglik = _gaussian_pair()
    positions = jax.random.normal(rng_key, (20, 2))
    init_fn = jax.vmap(lambda p: ns_base.init_state_strategy(p, logprior, loglik))
    state = ns_base.init(positions, init_fn, loglikelihood_birth=-jnp.inf)
    assert isinstance(state, NSState)
    assert (np.asarray(state.particles.loglikelihood_birth) == -np.inf).all()


def test_delete_fn_returns_lowest_k(rng_key):
    logprior, loglik = _gaussian_pair()
    positions = jax.random.normal(rng_key, (30, 2))
    init_fn = jax.vmap(lambda p: ns_base.init_state_strategy(p, logprior, loglik))
    state = ns_base.init(positions, init_fn)
    dead_idx, target_idx = ns_base.delete_fn(state, 7)
    assert dead_idx.shape == (7,)
    np.testing.assert_array_equal(np.asarray(dead_idx), np.asarray(target_idx))
    lls = np.asarray(state.particles.loglikelihood)
    np.testing.assert_array_equal(
        np.sort(lls[np.asarray(dead_idx)]), np.sort(lls)[:7]
    )


@pytest.mark.parametrize("num_delete", [1, 5, 25])
def test_step_consistency_across_num_delete(num_delete, rng_key):
    """Invariants of one NS step at any deletion batch size: exactly
    ``num_delete`` dead particles reported, every survivor + replacement
    lies above the dead contour, and the worst live likelihood never
    decreases."""
    logprior, loglik = _gaussian_pair()
    algo = blackjax_tpu.nss(
        logprior, loglik, num_inner_steps=3, num_delete=num_delete
    )
    positions = 2.0 * jax.random.normal(rng_key, (100, 2))
    state = algo.init(positions, rng_key=rng_key)
    min_before = float(state.particles.loglikelihood.min())
    new_state, info = jax.jit(algo.step)(rng_key, state)

    assert info.particles.loglikelihood.shape == (num_delete,)
    contour = float(info.particles.loglikelihood.max())
    assert float(new_state.particles.loglikelihood.min()) >= min_before
    # replacements were resurrected above the deletion contour
    new_lls = np.asarray(new_state.particles.loglikelihood)
    assert (np.sort(new_lls)[-num_delete:] > -np.inf).all()
    # dead set is exactly the lowest-likelihood prefix of the previous state
    old_lls = np.sort(np.asarray(state.particles.loglikelihood))
    np.testing.assert_allclose(
        np.sort(np.asarray(info.particles.loglikelihood)),
        old_lls[:num_delete],
        rtol=1e-12,
    )
    # the birth contour of replacements equals the deletion contour
    born = np.asarray(new_state.particles.loglikelihood_birth)
    assert (born[np.isfinite(born)] <= contour + 1e-9).all()


# ---------------------------------------------------------------------------
# utils algebra
# ---------------------------------------------------------------------------


def _fake_dead_stream(n=200, num_live=50, key=None):
    """A synthetic single-delete dead stream: ascending death likelihoods,
    each particle born at the previous death contour."""
    death = jnp.sort(jax.random.normal(key, (n,))) if key is not None else jnp.linspace(0, 5, n)
    birth = jnp.concatenate([jnp.full((num_live,), jnp.nan), death[: n - num_live]])
    particles = StateWithLogLikelihood(
        position=death[:, None] * jnp.ones((1, 2)),
        logdensity=jnp.zeros(n),
        loglikelihood=death,
        loglikelihood_birth=birth,
    )
    return NSInfo(particles, None)


def test_logX_monotone_and_finite(rng_key):
    dead = _fake_dead_stream()
    cumulative, log_dX = ns_utils.logX(rng_key, dead, shape=32)
    c = np.asarray(cumulative)
    assert c.shape == (200, 32)
    # volumes shrink monotonically on every stochastic path
    assert (np.diff(c, axis=0) < 0).all()
    assert (c < 0).all()
    # all but the final trapezoid are finite
    assert np.isfinite(np.asarray(log_dX)[:-1]).all()


def test_log_weights_preserve_input_order(rng_key):
    """log_weights sorts internally but must return weights in the caller's
    particle order: permuting the input permutes the output identically."""
    dead = _fake_dead_stream()
    perm = jax.random.permutation(rng_key, 200)
    shuffled = jax.tree.map(lambda x: x[perm], dead)
    w = ns_utils.log_weights(rng_key, dead, shape=16)
    w_shuffled = ns_utils.log_weights(rng_key, shuffled, shape=16)
    np.testing.assert_allclose(
        np.asarray(w)[np.asarray(perm)], np.asarray(w_shuffled), rtol=1e-10
    )


def test_finalise_counts_and_ess_bounds(rng_key):
    logprior, loglik = _gaussian_pair()
    num_live, num_delete, steps = 80, 4, 10
    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=3, num_delete=num_delete)
    state = algo.init(2.0 * jax.random.normal(rng_key, (num_live, 2)), rng_key=rng_key)
    dead = []
    for i in range(steps):
        state, info = jax.jit(algo.step)(jax.random.fold_in(rng_key, i), state)
        dead.append(info)
    final = ns_utils.finalise(state, dead)
    n_total = num_delete * steps + num_live
    assert final.particles.loglikelihood.shape == (n_total,)
    assert final.particles.position.shape == (n_total, 2)
    eff = float(ns_utils.ess(rng_key, final))
    assert 1.0 <= eff <= n_total


def test_sample_draws_come_from_dead_set(rng_key):
    dead = _fake_dead_stream()
    draws = ns_utils.sample(rng_key, dead, shape=500)
    assert draws.position.shape == (500, 2)
    # every draw is one of the dead particles
    dead_lls = set(np.asarray(dead.particles.loglikelihood).tolist())
    drawn = set(np.asarray(draws.loglikelihood).tolist())
    assert drawn.issubset(dead_lls)
    # resampling favors high-likelihood particles for this stream
    assert float(np.median(np.asarray(draws.loglikelihood))) > float(
        np.median(np.asarray(dead.particles.loglikelihood))
    )


def test_uniform_prior_utility(rng_key):
    bounds = {"a": (jnp.zeros(2), jnp.ones(2) * 2.0), "b": (-1.0, 1.0)}
    particles, logprior_fn = ns_utils.uniform_prior(rng_key, 100, bounds)
    assert particles["a"].shape == (100, 2)
    assert particles["b"].shape == (100,)
    assert (np.asarray(particles["a"]) >= 0).all()
    assert (np.asarray(particles["a"]) <= 2).all()
    # inside: log density = -log(total volume) = -log(2*2*2)
    inside = {"a": jnp.ones(2), "b": jnp.zeros(())}
    np.testing.assert_allclose(float(logprior_fn(inside)), -np.log(8.0), rtol=RTOL_EXACT)
    outside = {"a": jnp.ones(2) * 5.0, "b": jnp.zeros(())}
    assert float(logprior_fn(outside)) == -np.inf


@pytest.mark.slow
def test_uniform_prior_evidence(rng_key):
    """Evidence for a uniform box prior and a Gaussian likelihood: when the
    box comfortably contains the likelihood mass, Z = (1/volume) * integral
    of the likelihood = (1/4) * 2*pi*sigma... computed analytically in 1d."""
    sigma = 0.1
    bounds = {"x": (-2.0, 2.0)}
    particles, logprior_fn = ns_utils.uniform_prior(rng_key, 300, bounds)
    loglik = lambda p: -0.5 * (p["x"] / sigma) ** 2 - 0.5 * jnp.log(
        2 * jnp.pi * sigma**2
    )
    true_logz = float(-jnp.log(4.0))  # likelihood integrates to 1 inside the box

    algo = blackjax_tpu.nss(logprior_fn, loglik, num_inner_steps=5, num_delete=15)
    state = algo.init(particles, rng_key=rng_key)
    step = jax.jit(algo.step)
    for i in range(100):
        state, info = step(jax.random.fold_in(rng_key, i), state)
    logz = float(jnp.logaddexp(state.integrator.logZ, state.integrator.logZ_live))
    assert abs(logz - true_logz) < 0.35, (logz, true_logz)


# ---------------------------------------------------------------------------
# top-level seams
# ---------------------------------------------------------------------------


def test_nss_top_level_seams(rng_key):
    logprior, loglik = _gaussian_pair()
    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=2, num_delete=5)
    assert isinstance(algo, SamplingAlgorithm)
    state = algo.init(jax.random.normal(rng_key, (40, 2)), rng_key=rng_key)
    new_state, info = algo.step(rng_key, state)
    assert isinstance(info, NSInfo)
    assert hasattr(new_state, "integrator")


def test_nsswig_top_level_seams(rng_key):
    logprior, loglik = _gaussian_pair()
    algo = blackjax_tpu.nsswig(logprior, loglik, num_inner_steps=2, num_delete=5)
    state = algo.init(jax.random.normal(rng_key, (40, 2)), rng_key=rng_key)
    new_state, info = jax.jit(algo.step)(rng_key, state)
    assert info.particles.loglikelihood.shape == (5,)
