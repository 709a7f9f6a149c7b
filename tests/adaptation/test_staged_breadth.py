"""Staged-warmup breadth: metric-argument resolution, schedule edge
behavior, alternative inner samplers, multichain pooling, and parameter
passthrough conventions.

Scenario parity target: the reference's
``tests/adaptation/test_staged_adaptation.py`` (metric-arg variants,
all-fast schedules, per-sampler runs, multichain paths).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.metric_recipes import REGISTRY, MetricCore
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation

VARIANCES = jnp.array([0.5, 2.0, 1.0, 4.0])


def _logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


# ---------------------------------------------------------------------------
# metric-argument resolution
# ---------------------------------------------------------------------------


def test_metric_string_recipe_and_core_agree(rng_key):
    """The three spellings of the same metric — registry name, recipe
    object, prebuilt core — must produce identical warmups under the same
    key."""
    recipe = REGISTRY["welford_diag"]
    results = []
    for metric in ("welford_diag", recipe, recipe.build_core()):
        warmup = staged_adaptation(blackjax_tpu.nuts, _logdensity, metric=metric)
        (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=200)
        results.append(params)
    for later in results[1:]:
        np.testing.assert_array_equal(
            np.asarray(results[0]["step_size"]), np.asarray(later["step_size"])
        )
        np.testing.assert_array_equal(
            np.asarray(results[0]["inverse_mass_matrix"]),
            np.asarray(later["inverse_mass_matrix"]),
        )


def test_unknown_string_metric_raises():
    with pytest.raises(ValueError, match="Unknown metric recipe"):
        staged_adaptation(blackjax_tpu.nuts, _logdensity, metric="not_a_recipe")


def test_invalid_metric_type_raises():
    with pytest.raises(ValueError, match="metric must be"):
        staged_adaptation(blackjax_tpu.nuts, _logdensity, metric=12345)


def test_auto_metric_requires_grad_budget():
    with pytest.raises(ValueError, match="max_grad_budget"):
        staged_adaptation(blackjax_tpu.nuts, _logdensity, metric="auto")


def test_every_registry_recipe_constructs_a_core():
    for name, recipe in REGISTRY.items():
        # low-rank recipes require an explicit window size (buffer_size or,
        # for the streaming draws-SVD ring, capacity)
        for options in ({}, {"buffer_size": 64}, {"capacity": 64}):
            try:
                core = recipe.build_core(**options)
                break
            except TypeError:
                continue
        else:
            raise AssertionError(f"{name}: no option spelling constructs a core")
        assert isinstance(core, MetricCore), name


# ---------------------------------------------------------------------------
# schedule edge behavior
# ---------------------------------------------------------------------------


def test_all_fast_warmup_keeps_identity_metric(rng_key):
    """A warmup too short to fit any slow window must leave the metric at
    its identity initialization (only the step size adapts)."""
    warmup = staged_adaptation(blackjax_tpu.nuts, _logdensity)
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=12)
    np.testing.assert_allclose(
        np.asarray(params["inverse_mass_matrix"]), np.ones(4), rtol=1e-12
    )
    assert np.isfinite(float(params["step_size"]))


def test_long_warmup_leaves_identity_metric_behind(rng_key):
    warmup = staged_adaptation(blackjax_tpu.nuts, _logdensity)
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=400)
    imm = np.asarray(params["inverse_mass_matrix"])
    assert not np.allclose(imm, np.ones(4))
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.6)


# ---------------------------------------------------------------------------
# alternative inner samplers
# ---------------------------------------------------------------------------


def test_hmc_staged_with_integration_steps(rng_key):
    warmup = staged_adaptation(
        blackjax_tpu.hmc, _logdensity, num_integration_steps=8
    )
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=300)
    assert np.isfinite(float(params["step_size"]))
    # returned parameters reconstruct the kernel directly (our convention:
    # extra parameters are folded into the returned dict)
    assert params["num_integration_steps"] == 8
    algo = blackjax_tpu.hmc(_logdensity, **params)
    new_state, info = algo.step(rng_key, state)
    assert np.isfinite(float(info.acceptance_rate))


def test_hmc_staged_hits_target_acceptance_across_trajectory_lengths():
    """What dual averaging actually promises: whatever the trajectory
    length, the TUNED kernel's observed acceptance sits near the 0.8
    target. (A step-size ORDERING between lengths is not an invariant on
    this target — measured both ways across seeds.)"""
    key = jax.random.key(42)
    for n in (2, 32):
        warmup = staged_adaptation(
            blackjax_tpu.hmc, _logdensity, num_integration_steps=n
        )
        (state, params), _ = warmup.run(key, jnp.zeros(4), num_steps=400)
        algo = blackjax_tpu.hmc(_logdensity, **params)

        def step(s, k):
            s, info = algo.step(k, s)
            return s, info.acceptance_rate

        _, acc = jax.lax.scan(step, state, jax.random.split(key, 300))
        assert 0.6 < float(jnp.mean(acc)) <= 1.0, (n, float(jnp.mean(acc)))


def test_barker_staged_warmup(rng_key):
    warmup = staged_adaptation(
        blackjax_tpu.barker, _logdensity, target_acceptance_rate=0.57
    )
    (state, params), _ = warmup.run(rng_key, jnp.zeros(4), num_steps=300)
    assert np.isfinite(float(params["step_size"]))
    algo = blackjax_tpu.barker(_logdensity, **params)
    new_state, info = algo.step(rng_key, state)
    assert np.isfinite(float(new_state.logdensity))


def test_dynamic_hmc_is_not_staged_compatible():
    """dynamic_hmc's init requires a random_generator_arg, so it cannot ride
    the staged engine (whose protocol is init(position, logdensity_fn)) —
    pin the failure mode so the contract stays visible."""
    warmup = staged_adaptation(blackjax_tpu.dynamic_hmc, _logdensity)
    with pytest.raises(TypeError, match="random_generator_arg"):
        warmup.run(jax.random.key(0), jnp.zeros(4), num_steps=20)


# ---------------------------------------------------------------------------
# multichain pooling
# ---------------------------------------------------------------------------


def test_multichain_staged_pools_the_ensemble(rng_key):
    n_chains = 16
    warmup = staged_adaptation(
        blackjax_tpu.nuts, _logdensity, n_chains=n_chains
    )
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (n_chains, 4))
    (state, params), _ = warmup.run(warm_key, positions, num_steps=300)
    # one shared step size, chain-axis state
    assert jnp.ndim(params["step_size"]) == 0
    assert state.position.shape == (n_chains, 4)
    np.testing.assert_allclose(
        np.asarray(params["inverse_mass_matrix"]), np.asarray(VARIANCES), rtol=0.6
    )


def test_multichain_pools_faster_than_single_chain(rng_key):
    """The pooled 16-chain metric at 150 steps should estimate the target
    variances at least as well as a single chain at 150 steps (ensemble
    pooling is the point of the multichain path)."""
    init_key, warm_key = jax.random.split(rng_key)

    single = staged_adaptation(blackjax_tpu.nuts, _logdensity)
    (_, p1), _ = single.run(warm_key, jnp.zeros(4), num_steps=150)

    pooled = staged_adaptation(blackjax_tpu.nuts, _logdensity, n_chains=16)
    positions = jax.random.normal(init_key, (16, 4))
    (_, p16), _ = pooled.run(warm_key, positions, num_steps=150)

    err1 = np.abs(np.log(np.asarray(p1["inverse_mass_matrix"]) / np.asarray(VARIANCES))).sum()
    err16 = np.abs(np.log(np.asarray(p16["inverse_mass_matrix"]) / np.asarray(VARIANCES))).sum()
    assert err16 < err1 * 1.5  # pooled estimate is not systematically worse


def test_axis_name_requires_multichain():
    with pytest.raises(ValueError, match="axis_name"):
        staged_adaptation(blackjax_tpu.nuts, _logdensity, axis_name="chains")
