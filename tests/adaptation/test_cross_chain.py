"""Cross-chain adaptation: ChEES and MEADS end-to-end on an anisotropic
Gaussian (mirrors reference ``tests/mcmc/test_sampling.py:322-831``)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import blackjax_tpu

VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def test_chees_adaptation(rng_key):
    num_chains = 64
    warm_key, init_key, sample_key = jax.random.split(rng_key, 3)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0

    warmup = blackjax_tpu.chees_adaptation(logdensity, num_chains)
    (last_states, parameters), info = warmup.run(
        warm_key, positions, 0.1, optax.adam(0.25), 400
    )
    assert np.isfinite(float(parameters["step_size"]))
    assert float(parameters["integration_steps_params"][0]) >= 1.0

    kernel = blackjax_tpu.dynamic_hmc(logdensity, **parameters).step

    def one_step(states, key):
        keys = jax.random.split(key, num_chains)
        states, infos = jax.vmap(kernel)(keys, states)
        return states, states.position

    keys = jax.random.split(sample_key, 300)
    _, positions_trace = jax.lax.scan(one_step, last_states, keys)
    samples = np.asarray(positions_trace[100:]).reshape(-1, 4)
    np.testing.assert_allclose(samples.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(samples.var(0), np.asarray(VARIANCES), rtol=0.3)


def test_chees_with_diagonal_mass_matrix(rng_key):
    num_chains = 64
    warm_key, init_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0
    warmup = blackjax_tpu.chees_adaptation(
        logdensity, num_chains, mass_matrix_estimation="diagonal"
    )
    (last_states, parameters), info = warmup.run(
        warm_key, positions, 0.1, optax.adam(0.25), 400
    )
    imm = np.asarray(parameters["inverse_mass_matrix"])
    # pooled variance estimate should roughly match target variances
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.5)


def test_meads_adaptation(rng_key):
    num_chains = 128
    warm_key, init_key, sample_key = jax.random.split(rng_key, 3)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0

    warmup = blackjax_tpu.meads_adaptation(logdensity, num_chains)
    (last_states, parameters), info = warmup.run(warm_key, positions, 400)
    assert np.isfinite(float(parameters["step_size"]))
    assert 0.0 < float(parameters["alpha"]) <= 1.0

    kernel = blackjax_tpu.ghmc(logdensity, **parameters).step

    def one_step(states, key):
        keys = jax.random.split(key, num_chains)
        states, infos = jax.vmap(kernel)(keys, states)
        return states, states.position

    keys = jax.random.split(sample_key, 400)
    _, positions_trace = jax.lax.scan(one_step, last_states, keys)
    samples = np.asarray(positions_trace[100:]).reshape(-1, 4)
    np.testing.assert_allclose(samples.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(samples.var(0), np.asarray(VARIANCES), rtol=0.3)


def test_maximum_eigenvalue_accuracy(rng_key):
    from blackjax_tpu.adaptation.meads_adaptation import maximum_eigenvalue

    # ratio estimator approximates sum(lam^2)/sum(lam) = 82.26/10.6 ~ 7.76,
    # a slight underestimate of lam_max = 9 by construction
    cov = jnp.diag(jnp.array([9.0, 1.0, 0.5, 0.1]))
    samples = jax.random.normal(rng_key, (2000, 4)) @ jnp.sqrt(cov)
    est = float(maximum_eigenvalue(samples))
    assert 6.5 < est < 9.5


def test_chees_length_floor(rng_key):
    """A strong off-diagonal correlation the diagonal metric can't remove:
    the floored consumed trajectory length must respect the quarter-turn
    rule (pi/2) sqrt(lambda_max) of the whitened covariance."""
    from blackjax_tpu.adaptation.chees_adaptation import (
        CHEES_LENGTH_FLOOR_FACTOR,
        _apply_length_floor,
        _eig_state_init,
        _recompute_eig_state,
    )

    d, num_chains = 4, 64
    v = jnp.ones(d) / 2.0
    cov = jnp.eye(d) + 20.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    corr_logdensity = lambda x: -0.5 * x @ prec @ x

    warm_key, init_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, d)) * 2.0
    warmup = blackjax_tpu.chees_adaptation(
        corr_logdensity,
        num_chains,
        mass_matrix_estimation="diagonal",
        _length_floor=True,
    )
    (last_states, parameters), info = warmup.run(
        warm_key, positions, 0.1, optax.adam(0.25), 400
    )
    step_size = float(parameters["step_size"])
    avg_steps = float(parameters["integration_steps_params"][0])
    consumed_length = avg_steps * step_size
    # marginal variances are all 1 + 20/4 = 6; whitened lambda_max ~ large
    # -> floor ~ (pi/2) sqrt(lambda_max) must bind from below
    assert consumed_length >= 0.9 * CHEES_LENGTH_FLOOR_FACTOR  # lambda >= ~1

    # unit behavior: cap binds, disabled seam is the identity
    length, clipped = _apply_length_floor(
        jnp.asarray(0.5), jnp.asarray(100.0), jnp.asarray(True), True, 3, 0.1
    )
    assert bool(clipped) and float(length) == pytest.approx(0.3)
    length, clipped = _apply_length_floor(
        jnp.asarray(0.5), jnp.asarray(100.0), jnp.asarray(True), False, 3, 0.1
    )
    assert float(length) == 0.5 and not bool(clipped)

    # power iteration recovers the planted top eigenpair of a dense accum
    xs = jax.random.normal(jax.random.key(0), (4000, d)) @ jnp.linalg.cholesky(cov).T
    count = jnp.asarray(float(xs.shape[0]))
    mean = xs.mean(0)
    m2 = (xs - mean).T @ (xs - mean)
    eig = _recompute_eig_state(
        count, mean, m2, jnp.diag(cov), _eig_state_init(d), 20
    )
    true_whitened = cov / jnp.sqrt(jnp.outer(jnp.diag(cov), jnp.diag(cov)))
    true_lam = float(jnp.linalg.eigvalsh(true_whitened)[-1])
    assert float(eig.lambda_max) == pytest.approx(true_lam, rel=0.1)


def test_chees_length_floor_requires_diagonal(rng_key):
    with pytest.raises(ValueError, match="_length_floor"):
        blackjax_tpu.chees_adaptation(logdensity, 8, _length_floor=True)


def test_meads_lrd(rng_key):
    """MEADS-LRD on a correlated Gaussian: the pooled low-rank momentum
    metric captures the planted direction and GHMC sampling stays accurate."""
    from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix

    d, num_chains = 4, 128
    v = jnp.ones(d) / 2.0
    cov = jnp.eye(d) + 12.0 * jnp.outer(v, v)
    prec = jnp.linalg.inv(cov)
    corr_logdensity = lambda x: -0.5 * x @ prec @ x

    warm_key, init_key, sample_key = jax.random.split(rng_key, 3)
    positions = jax.random.normal(init_key, (num_chains, d)) * 2.0
    warmup = blackjax_tpu.meads_adaptation(
        corr_logdensity, num_chains, low_rank_rank=2
    )
    (last_states, parameters), info = warmup.run(warm_key, positions, 600)
    metric = parameters["momentum_inverse_scale"]
    assert isinstance(metric, LowRankInverseMassMatrix)
    assert metric.U.shape == (d, 2)
    # top |lam-1| direction of the accumulated correlation ~ planted v
    assert abs(float(metric.U[:, 0] @ v)) > 0.9
    assert np.isfinite(float(parameters["step_size"]))

    kernel = blackjax_tpu.ghmc(corr_logdensity, **parameters).step

    def one_step(states, key):
        keys = jax.random.split(key, num_chains)
        states, infos = jax.vmap(kernel)(keys, states)
        return states, states.position

    keys = jax.random.split(sample_key, 500)
    _, positions_trace = jax.lax.scan(one_step, last_states, keys)
    samples = np.asarray(positions_trace[150:]).reshape(-1, d)
    # marginal variances: diag(cov) = 1 + 12/4 = 4
    np.testing.assert_allclose(samples.var(0), np.full(d, 4.0), rtol=0.35)


def test_meads_lrd_validation():
    logdensity_fn = lambda x: -0.5 * jnp.sum(x**2)
    with pytest.raises(ValueError, match="num_chains - 1"):
        blackjax_tpu.meads_adaptation(
            logdensity_fn, 1, num_folds=1, low_rank_rank=3
        )
    with pytest.raises(ValueError, match="window_fraction"):
        blackjax_tpu.meads_adaptation(
            logdensity_fn, 8, low_rank_rank=2, low_rank_window_fraction=1.5
        )
