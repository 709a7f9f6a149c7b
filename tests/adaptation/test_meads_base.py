"""MEADS controller unit breadth: per-fold parameter mechanics, the
neighbor-write rule, knob effects, eigenvalue-estimator exactness, and the
single-fold edge.

Scenario parity target: the reference's ``tests/adaptation/test_meads.py``
(TestMEADSBase, TestMEADSAdaptation).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.meads_adaptation import (
    MEADSAdaptationState,
    base,
    maximum_eigenvalue,
    meads_adaptation,
)

VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def _ensemble(key, n=32, d=4):
    positions = jax.random.normal(key, (n, d)) * jnp.sqrt(VARIANCES)
    grads = jax.vmap(jax.grad(logdensity))(positions)
    return positions, grads


# ---------------------------------------------------------------------------
# base controller
# ---------------------------------------------------------------------------


def test_base_init_shapes_and_uniform_folds(rng_key):
    init, _ = base(num_folds=4)
    positions, grads = _ensemble(rng_key)
    state = init(positions, grads)
    assert state.step_size.shape == (4,)
    assert state.alpha.shape == (4,)
    assert state.position_sigma.shape == (4, 4)
    # at init every fold carries the same ensemble-derived parameters
    for arr in (state.step_size, state.alpha, state.delta):
        assert len(np.unique(np.asarray(arr))) == 1
    np.testing.assert_allclose(
        np.asarray(state.position_sigma),
        np.tile(np.asarray(state.position_sigma[0]), (4, 1)),
    )


def test_base_update_writes_only_neighbor_fold(rng_key):
    init, update = base(num_folds=4)
    positions, grads = _ensemble(rng_key)
    state = init(positions, grads)
    # perturb the ensemble so the recomputed parameters differ
    new_positions = positions * 3.0
    new_grads = jax.vmap(jax.grad(logdensity))(new_positions)
    new_state = update(state, new_positions, new_grads, source_fold=1)
    changed = np.asarray(new_state.step_size) != np.asarray(state.step_size)
    np.testing.assert_array_equal(changed, [False, False, True, False])
    sig_changed = ~np.isclose(
        np.asarray(new_state.position_sigma), np.asarray(state.position_sigma)
    ).all(axis=1)
    np.testing.assert_array_equal(sig_changed, [False, False, True, False])
    assert new_state.current_iteration == state.current_iteration + 1


def test_base_update_wraps_last_fold(rng_key):
    init, update = base(num_folds=3)
    positions, grads = _ensemble(rng_key)
    state = init(positions, grads)
    # NB the perturbation must not be scale-invariant: the controller is
    # invariant to (positions * c, grads / c), so recompute real gradients
    new_positions = positions * 2.0
    new_grads = jax.vmap(jax.grad(logdensity))(new_positions)
    new_state = update(state, new_positions, new_grads, source_fold=2)
    changed = np.asarray(new_state.step_size) != np.asarray(state.step_size)
    np.testing.assert_array_equal(changed, [True, False, False])


def test_base_invalid_num_folds():
    with pytest.raises(ValueError, match="num_folds"):
        base(num_folds=0)


def test_step_size_multiplier_scales_epsilon(rng_key):
    positions, grads = _ensemble(rng_key)
    small = base(step_size_multiplier=0.1)[0](positions, grads)
    large = base(step_size_multiplier=0.4)[0](positions, grads)
    # pre-cap the step size is linear in the multiplier
    np.testing.assert_allclose(
        4.0 * float(small.step_size[0]), float(large.step_size[0]), rtol=1e-6
    )


def test_damping_slowdown_raises_early_alpha(rng_key):
    positions, grads = _ensemble(rng_key)
    default = base(damping_slowdown=1.0)[0](positions, grads)
    slowed = base(damping_slowdown=100.0)[0](positions, grads)
    # at iteration 0 the floor gamma = slowdown / epsilon dominates: more
    # slowdown -> larger gamma -> larger alpha (more momentum refresh)
    assert float(slowed.alpha[0]) > float(default.alpha[0])


# ---------------------------------------------------------------------------
# maximum_eigenvalue estimator
# ---------------------------------------------------------------------------


def _numpy_max_eig_estimate(X):
    """The unbiased ratio estimator E[sum lam^2]/E[sum lam] in numpy."""
    X = np.asarray(X)
    n = X.shape[0]
    gram = X @ X.T
    diag = np.diagonal(gram)
    first = diag.sum() / n
    second = ((gram**2).sum() - (diag**2).sum()) / (n * (n - 1))
    return second / first


@pytest.mark.parametrize("n,d", [(8, 16), (64, 4)], ids=["gram-form", "cov-form"])
def test_maximum_eigenvalue_matches_reference_formula(n, d, rng_key):
    """Both evaluation forms (Gram for n<=d, covariance for n>d) compute the
    SAME estimator; pin each against the numpy formula."""
    X = jax.random.normal(rng_key, (n, d)) * jnp.arange(1.0, d + 1.0)
    got = float(maximum_eigenvalue(X))
    # the numpy reference runs in f64 from the same inputs; the f32 jax
    # evaluation squares Gram entries, amplifying rounding
    np.testing.assert_allclose(
        got, _numpy_max_eig_estimate(X), rtol=1e-8 if jax.config.jax_enable_x64 else 5e-4
    )


def test_maximum_eigenvalue_accuracy_on_spike(rng_key):
    d = 6
    v = jnp.ones(d) / jnp.sqrt(d)
    cov = jnp.eye(d) + 49.0 * jnp.outer(v, v)
    X = jax.random.normal(rng_key, (4000, d)) @ jnp.linalg.cholesky(cov).T
    np.testing.assert_allclose(float(maximum_eigenvalue(X)), 50.0, rtol=0.15)


# ---------------------------------------------------------------------------
# meads_adaptation run-level contracts
# ---------------------------------------------------------------------------


def test_num_chains_must_divide_folds():
    with pytest.raises(ValueError, match="divisible"):
        meads_adaptation(logdensity, num_chains=10, num_folds=4)


def test_num_folds_1_chains_advance(rng_key):
    """With a single fold there is no freezing: EVERY chain moves (subject
    to GHMC acceptance) and the warmup still produces usable parameters."""
    num_chains = 16
    warmup = meads_adaptation(logdensity, num_chains, num_folds=1)
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4))
    (last_states, parameters), info = warmup.run(warm_key, positions, num_steps=100)
    moved = ~np.isclose(
        np.asarray(last_states.position), np.asarray(positions)
    ).all(axis=1)
    assert moved.all()
    assert np.isfinite(float(parameters["step_size"]))


def test_folds_develop_different_params(rng_key):
    """After the first K steps each fold's parameters come from a different
    source fold: the per-fold step sizes decouple."""
    num_chains, num_folds = 32, 4
    warmup = meads_adaptation(logdensity, num_chains, num_folds=num_folds)
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4)) * 2.0
    (_, parameters), info = warmup.run(warm_key, positions, num_steps=50)
    fold_step_sizes = np.asarray(info.adaptation_state.step_size[-1])
    assert fold_step_sizes.shape == (num_folds,)
    assert len(np.unique(fold_step_sizes)) > 1


def test_lrd_rank_clamped_to_num_chains_minus_one(rng_key):
    """low_rank_rank larger than num_chains-1 is clamped, not an error."""
    num_chains = 8
    warmup = meads_adaptation(
        logdensity, num_chains, num_folds=4, low_rank_rank=50
    )
    init_key, warm_key = jax.random.split(rng_key)
    positions = jax.random.normal(init_key, (num_chains, 4))
    (last_states, parameters), _ = warmup.run(warm_key, positions, num_steps=30)
    imm = parameters["momentum_inverse_scale"]
    # the deployed metric's rank axis is bounded by num_chains - 1
    assert imm.U.shape[-1] <= num_chains - 1
