"""Unit-level exactness tests for the persistent-sampling building blocks.

Mirrors the scenario coverage of the reference's
``tests/smc/test_persistent_sampling.py`` (init/padding structure, log-Z
exactness, mixture-weight identities, persistent ESS, resampling from the
history ensemble including pytree leaves, per-iteration state updates) —
re-derived from the algebra of eqs. 14-17 rather than ported.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.smc import resampling
from blackjax_tpu.smc.persistent_sampling import (
    PersistentSMCState,
    compute_log_Z,
    compute_log_persistent_weights,
    compute_persistent_ess,
    init,
    remove_padding,
    resample_from_persistent,
    step,
)


@pytest.fixture
def rng_key():
    return jax.random.key(0)


N = 16
N_SCHEDULE = 5


def _loglik(x):
    return -0.5 * jnp.sum(x**2, axis=-1) if x.ndim > 1 else -0.5 * jnp.sum(x**2)


def test_init_allocates_padded_history(rng_key):
    particles = jax.random.normal(rng_key, (N, 3))
    state = init(particles, _loglik, N_SCHEDULE)
    slots = N_SCHEDULE + 1
    assert state.persistent_particles.shape == (slots, N, 3)
    assert state.persistent_log_likelihoods.shape == (slots, N)
    assert state.persistent_log_Z.shape == (slots,)
    assert state.tempering_schedule.shape == (slots,)
    assert int(state.iteration) == 0
    # slot 0 holds the prior draws and their log likelihoods; the rest zero
    np.testing.assert_allclose(state.persistent_particles[0], particles)
    np.testing.assert_allclose(
        state.persistent_log_likelihoods[0], _loglik(particles), rtol=1e-6
    )
    assert (np.asarray(state.persistent_particles[1:]) == 0).all()
    # the state properties index the current iteration
    np.testing.assert_allclose(state.particles, particles)
    assert float(state.tempering_param) == 0.0
    assert state.num_particles == N


def test_init_with_pytree_particles(rng_key):
    k1, k2 = jax.random.split(rng_key)
    particles = {
        "loc": jax.random.normal(k1, (N, 2)),
        "scale": jax.random.normal(k2, (N,)),
    }
    loglik = lambda p: -0.5 * jnp.sum(p["loc"] ** 2, axis=-1) - 0.5 * p["scale"] ** 2
    state = init(particles, loglik, N_SCHEDULE)
    assert state.persistent_particles["loc"].shape == (N_SCHEDULE + 1, N, 2)
    assert state.persistent_particles["scale"].shape == (N_SCHEDULE + 1, N)


def test_remove_padding_trims_to_iteration(rng_key):
    particles = jax.random.normal(rng_key, (N, 3))
    state = init(particles, _loglik, N_SCHEDULE)
    state = state._replace(iteration=jnp.array(2))
    trimmed = remove_padding(state)
    assert trimmed.persistent_particles.shape == (3, N, 3)
    assert trimmed.persistent_log_likelihoods.shape == (3, N)
    assert trimmed.persistent_log_Z.shape == (3,)


def test_compute_log_Z_exact_for_constant_weights():
    # k*N live slots all carrying weight exp(c): the mean of the
    # unnormalized weights is exp(c) exactly, for any k
    for k, c in [(1, 0.7), (3, -1.2), (5, 0.0)]:
        logw = jnp.full((6, N), -jnp.inf).at[:k].set(c)
        np.testing.assert_allclose(float(compute_log_Z(logw, k)), c, rtol=1e-6)


def test_persistent_weights_sum_identity(rng_key):
    """logsumexp of the (unnormalized-to-one) persistent log weights is
    log(horizon * N) BY CONSTRUCTION — the exact self-normalization
    property eq. 16 relies on."""
    slots = N_SCHEDULE + 1
    logliks = jax.random.normal(rng_key, (slots, N))
    log_Z = 0.1 * jax.random.normal(jax.random.key(1), (slots,))
    schedule = jnp.linspace(0.0, 1.0, slots)
    for iteration, include in [(1, False), (2, True), (4, False)]:
        horizon = iteration + 1 if include else iteration
        logw, _ = compute_log_persistent_weights(
            logliks, log_Z, schedule, iteration, include_current=include
        )
        total = float(jax.scipy.special.logsumexp(logw))
        np.testing.assert_allclose(total, np.log(horizon * N), rtol=1e-6)
        # rows at or beyond the horizon carry no weight
        assert np.all(np.asarray(logw[horizon:]) == -np.inf)
        # normalize_to_one divides by horizon * N
        logw1, _ = compute_log_persistent_weights(
            logliks, log_Z, schedule, iteration,
            include_current=include, normalize_to_one=True,
        )
        np.testing.assert_allclose(
            float(jax.scipy.special.logsumexp(logw1)), 0.0, atol=1e-5
        )


def test_persistent_weights_uniform_for_constant_likelihood():
    """A constant likelihood makes every tempered target identical: each
    historical particle gets weight exactly 1."""
    slots = N_SCHEDULE + 1
    logliks = jnp.full((slots, N), -2.5)
    log_Z = jnp.zeros(slots)
    schedule = jnp.linspace(0.0, 1.0, slots)
    logw, log_Z_est = compute_log_persistent_weights(
        logliks, log_Z, schedule, 3, include_current=True
    )
    np.testing.assert_allclose(np.asarray(logw[:4]), 0.0, atol=1e-5)
    # and the normalizing-constant estimate is the analytic ratio
    # Z_lambda / mixture = exp(lambda_3 * c) / mean_i exp(lambda_i * c)
    lam = np.asarray(schedule[:4])
    expected = lam[3] * -2.5 - np.log(np.mean(np.exp(lam * -2.5)))
    np.testing.assert_allclose(float(log_Z_est), expected, rtol=1e-5)


def test_persistent_ess_uniform_and_degenerate():
    # uniform normalized weights over m live slots -> Kish ESS = m
    m = 3 * N
    logw = jnp.full((6, N), -jnp.inf).at[:3].set(0.0)
    ess = compute_persistent_ess(logw, normalize_weights=True)
    np.testing.assert_allclose(float(ess), m, rtol=1e-5)
    # all mass on one particle -> ESS = 1
    logw = jnp.full((6, N), -jnp.inf).at[0, 0].set(0.0)
    ess = compute_persistent_ess(logw, normalize_weights=True)
    np.testing.assert_allclose(float(ess), 1.0, rtol=1e-5)


def test_resample_from_persistent_degenerate_weights(rng_key):
    slots = N_SCHEDULE + 1
    particles = jnp.arange(slots * N * 2, dtype=jnp.float32).reshape(slots, N, 2)
    weights = jnp.zeros((slots, N)).at[2, 5].set(1.0)
    out, ancestors = resample_from_persistent(
        rng_key, particles, weights, resampling.systematic
    )
    # every draw is the single weighted particle (slot 2, index 5)
    np.testing.assert_allclose(out, jnp.broadcast_to(particles[2, 5], (N, 2)))
    assert (np.asarray(ancestors) == 2 * N + 5).all()


def test_resample_from_persistent_pytree_consistency(rng_key):
    """All leaves — including matrix-shaped ones — follow the same flat
    ancestor draw."""
    slots = 4
    key1, key2, key3 = jax.random.split(rng_key, 3)
    tree = {
        "v": jax.random.normal(key1, (slots, N, 3)),
        "m": jax.random.normal(key2, (slots, N, 2, 2)),
    }
    weights = jax.random.uniform(key3, (slots, N))
    weights = weights / weights.sum()
    out, ancestors = resample_from_persistent(
        jax.random.key(7), tree, weights, resampling.multinomial
    )
    slot_idx, within_idx = np.divmod(np.asarray(ancestors), N)
    np.testing.assert_allclose(
        np.asarray(out["v"]), np.asarray(tree["v"])[slot_idx, within_idx]
    )
    np.testing.assert_allclose(
        np.asarray(out["m"]), np.asarray(tree["m"])[slot_idx, within_idx]
    )


def test_step_writes_the_next_history_slot(rng_key):
    """One persistent step at lambda: iteration advances, the schedule and
    log-Z slots are written, and the mutated particles land in slot i+1.
    An identity update isolates the bookkeeping from the inner kernel."""
    init_key, step_key = jax.random.split(rng_key)
    particles = jax.random.normal(init_key, (N, 2))
    state = init(particles, _loglik, N_SCHEDULE)

    def identity_update(keys, seeds):
        return seeds, None

    new_state, info = step(
        step_key,
        state,
        lmbda=0.5,
        loglikelihood_fn=lambda x: _loglik(x),
        update_fn=identity_update,
        resample_fn=resampling.systematic,
    )
    assert int(new_state.iteration) == 1
    np.testing.assert_allclose(float(new_state.tempering_schedule[1]), 0.5)
    # slot 1 holds the moved particles with their recomputed logliks
    np.testing.assert_allclose(
        np.asarray(new_state.persistent_log_likelihoods[1]),
        np.asarray(jax.vmap(_loglik)(new_state.persistent_particles[1])),
        rtol=1e-5,
    )
    # with an identity update, slot 1 is a gather of slot 0 by ancestors
    anc = np.asarray(info.ancestors)
    assert anc.shape == (N,)
    assert (anc >= 0).all() and (anc < 1 * N).all()  # horizon was 1
    np.testing.assert_allclose(
        np.asarray(new_state.persistent_particles[1]),
        np.asarray(particles)[anc % N],
    )
