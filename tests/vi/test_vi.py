"""VI family: mean recovery for MFVI/FRVI, pathfinder approximation quality,
SVGD particle convergence, Schrödinger-Föllmer sampling."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import blackjax_tpu

LOC = jnp.array([1.0, -0.5])
SCALES = jnp.array([0.7, 1.3])


def logdensity(x):
    return -0.5 * jnp.sum(((x - LOC) / SCALES) ** 2)


def test_meanfield_vi(rng_key):
    algo = blackjax_tpu.meanfield_vi(logdensity, optax.adam(0.05), num_samples=50)
    state = algo.init(jnp.zeros(2))
    step = jax.jit(algo.step)
    for i in range(600):
        state, info = step(jax.random.fold_in(rng_key, i), state)
    np.testing.assert_allclose(np.asarray(state.mu), np.asarray(LOC), atol=0.15)
    np.testing.assert_allclose(
        np.exp(np.asarray(state.rho)), np.asarray(SCALES), atol=0.25
    )
    samples = algo.sample(rng_key, state, 1000)
    np.testing.assert_allclose(samples.mean(0), np.asarray(LOC), atol=0.2)


def test_fullrank_vi_recovers_correlation(rng_key):
    cov = jnp.array([[1.0, 0.7], [0.7, 1.0]])
    prec = jnp.linalg.inv(cov)

    def corr_logdensity(x):
        return -0.5 * x @ prec @ x

    algo = blackjax_tpu.fullrank_vi(corr_logdensity, optax.adam(0.05), num_samples=50)
    state = algo.init(jnp.zeros(2))
    step = jax.jit(algo.step)
    for i in range(800):
        state, info = step(jax.random.fold_in(rng_key, i), state)
    samples = algo.sample(rng_key, state, 4000)
    emp_cov = np.cov(np.asarray(samples).T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.2)


def test_pathfinder_gaussian(rng_key):
    state, info = blackjax_tpu.pathfinder.approximate(
        rng_key, logdensity, jnp.array([3.0, 3.0]), maxiter=20
    )
    assert np.isfinite(float(state.elbo))
    samples, logq = blackjax_tpu.pathfinder.sample(rng_key, state, 2000)
    np.testing.assert_allclose(np.asarray(samples).mean(0), np.asarray(LOC), atol=0.15)
    np.testing.assert_allclose(np.asarray(samples).std(0), np.asarray(SCALES), rtol=0.25)


def test_multipathfinder(rng_key):
    positions = jax.random.normal(rng_key, (4, 2)) * 2.0
    state, info = blackjax_tpu.multipathfinder(logdensity).init(
        rng_key, positions, num_samples=100, maxiter=15
    )
    samples = blackjax_tpu.multipathfinder(logdensity).sample(rng_key, state, 500)
    np.testing.assert_allclose(np.asarray(samples).mean(0), np.asarray(LOC), atol=0.25)


def test_elbo_improves_and_pytree_positions(rng_key):
    """The tracked loss must decrease over training, and dict positions must
    ride through init/step/sample with their structure intact."""
    ld = lambda p: -0.5 * jnp.sum((p["w"] - 1.0) ** 2) - 0.5 * jnp.sum(
        (p["b"] + 2.0) ** 2
    )
    algo = blackjax_tpu.meanfield_vi(ld, optax.adam(0.05), num_samples=30)
    state = algo.init({"w": jnp.zeros(3), "b": jnp.zeros(2)})
    step = jax.jit(algo.step)
    losses = []
    for i in range(400):
        state, info = step(jax.random.fold_in(rng_key, i), state)
        losses.append(float(info.elbo))
    assert np.mean(losses[-50:]) < np.mean(losses[:50])
    np.testing.assert_allclose(np.asarray(state.mu["w"]), 1.0, atol=0.2)
    np.testing.assert_allclose(np.asarray(state.mu["b"]), -2.0, atol=0.2)
    samples = algo.sample(rng_key, state, 100)
    assert samples["w"].shape == (100, 3) and samples["b"].shape == (100, 2)


def test_renyi_alpha_objective_trains(rng_key):
    """The Rényi-alpha bound (alpha != 1) must also recover the target; at
    alpha=1 it must reduce to the KL path exactly."""
    from blackjax_tpu.vi._gaussian_vi import KL, RenyiAlpha

    algo = blackjax_tpu.meanfield_vi(
        logdensity,
        optax.adam(0.05),
        num_samples=50,
        objective=RenyiAlpha(alpha=0.5),
        stl_estimator=False,
    )
    state = algo.init(jnp.zeros(2))
    step = jax.jit(algo.step)
    for i in range(600):
        state, _ = step(jax.random.fold_in(rng_key, i), state)
    np.testing.assert_allclose(
        np.asarray(state.mu), np.asarray(LOC),
        # the f32 optimization path converges more slowly on this seed
        atol=0.2 if jax.config.jax_enable_x64 else 0.35,
    )

    # alpha=1 == KL: identical single-step update for the same key
    kl = blackjax_tpu.meanfield_vi(logdensity, optax.adam(0.05), num_samples=20)
    r1 = blackjax_tpu.meanfield_vi(
        logdensity, optax.adam(0.05), num_samples=20, objective=RenyiAlpha(alpha=1.0)
    )
    s0 = kl.init(jnp.zeros(2))
    out_kl, _ = kl.step(rng_key, s0)
    out_r1, _ = r1.step(rng_key, s0)
    np.testing.assert_array_equal(np.asarray(out_kl.mu), np.asarray(out_r1.mu))


def test_svgd(rng_key):
    algo = blackjax_tpu.svgd(jax.grad(logdensity), optax.sgd(0.3))
    particles = jax.random.normal(rng_key, (80, 2)) + 3.0
    state = algo.init(particles)
    step = jax.jit(algo.step)
    for _ in range(300):
        state = step(state)
    final = np.asarray(state.particles)
    np.testing.assert_allclose(final.mean(0), np.asarray(LOC), atol=0.2)


def test_schrodinger_follmer(rng_key):
    algo = blackjax_tpu.schrodinger_follmer(logdensity, n_steps=100, n_inner_samples=200)
    state = algo.init(jnp.zeros(2))
    final = algo.sample(rng_key, state, 500)
    samples = np.asarray(final.position)
    np.testing.assert_allclose(samples.mean(0), np.asarray(LOC), atol=0.3)


def test_svgd_repulsion_prevents_collapse(rng_key):
    """SVGD must approximate the whole distribution, not just its mode: the
    kernel repulsion keeps the particle spread near the target scales (a
    pure gradient flow would collapse every particle onto the MAP)."""
    algo = blackjax_tpu.svgd(jax.grad(logdensity), optax.sgd(0.25))
    particles = jax.random.normal(rng_key, (150, 2)) * 3.0
    state = algo.init(particles)
    step = jax.jit(algo.step)
    for _ in range(500):
        state = step(state)
    final = np.asarray(state.particles)
    np.testing.assert_allclose(final.mean(0), np.asarray(LOC), atol=0.2)
    # spread tracks the target scales — neither collapsed nor unmoved
    np.testing.assert_allclose(final.std(0), np.asarray(SCALES), rtol=0.35)
    assert final.std(0).min() > 0.3
