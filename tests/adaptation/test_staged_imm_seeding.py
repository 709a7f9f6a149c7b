"""IMM seeding + shrinkage-to-previous behavioral grid for the staged
engine — the reference's ``StagedAdaptationIMMSeedBehavioralTest``
(``/root/reference/tests/adaptation/test_staged_adaptation.py:442-744``)
scenario class: a user-supplied starting inverse mass matrix must (a) be
in force from step one, (b) not poison long-warmup convergence, and (c)
persist through window ends exactly as much as ``imm_shrinkage_to_
previous`` says (the pseudo-count generalization of Stan's 5-count
identity shrinkage, ``mass_matrix.py:202-205``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.metric_recipes import _build_welford_core
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
from blackjax_tpu.mcmc import nuts as nuts_mod

DIM = 4
VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def _run(metric, num_steps=150, seed=11, initial_metric_state=None):
    engine = staged_adaptation(
        nuts_mod,
        logdensity,
        metric=metric,
        initial_metric_state=initial_metric_state,
    )
    return engine.run(jax.random.key(seed), jnp.ones(DIM), num_steps)


def test_backward_compat_no_seed_is_identity_start():
    """Without a seed the engine starts from the identity IMM and still
    converges toward the target variances."""
    results, _ = _run("welford_diag", num_steps=400)
    imm = np.asarray(results.parameters["inverse_mass_matrix"])
    assert np.all(np.isfinite(imm))
    np.testing.assert_allclose(imm, np.asarray(VARIANCES), rtol=0.75)


def test_diagonal_seed_is_in_force_from_step_one():
    """Seeding via initial_metric_state is live immediately: under an
    ALL-FAST schedule no slow-window end ever recomputes the metric, so
    both the per-step trace and the returned IMM must BE the seed."""
    seed_imm = jnp.array([0.5, 3.0, 0.3, 1.7])
    core = _build_welford_core(is_diagonal=True)
    seeded = core.init(DIM)._replace(inverse_mass_matrix=seed_imm)
    engine = staged_adaptation(
        nuts_mod,
        logdensity,
        metric=core,
        initial_metric_state=seeded,
        schedule_fn=lambda n: jnp.zeros((n, 2), jnp.int32),
    )
    results, info = engine.run(jax.random.key(11), jnp.ones(DIM), 20)
    np.testing.assert_array_equal(
        np.asarray(results.parameters["inverse_mass_matrix"]),
        np.asarray(seed_imm),
    )
    trace = np.asarray(info.adaptation_state.inverse_mass_matrix)
    np.testing.assert_array_equal(trace[0], np.asarray(seed_imm))
    np.testing.assert_array_equal(trace[-1], np.asarray(seed_imm))


def test_seed_differs_from_default_midway_but_both_converge():
    seed_imm = jnp.array([10.0, 10.0, 10.0, 10.0])
    core = _build_welford_core(is_diagonal=True)
    seeded = core.init(DIM)._replace(inverse_mass_matrix=seed_imm)
    r_seed, _ = _run(core, num_steps=150, initial_metric_state=seeded)
    r_plain, _ = _run("welford_diag", num_steps=150)
    # different starting geometry => different adapted step size
    assert float(r_seed.parameters["step_size"]) != float(
        r_plain.parameters["step_size"]
    )
    # but a bad seed must not poison convergence at realistic length
    r_long, _ = _run(core, num_steps=500, initial_metric_state=seeded)
    np.testing.assert_allclose(
        np.asarray(r_long.parameters["inverse_mass_matrix"]),
        np.asarray(VARIANCES),
        rtol=0.75,
    )


def test_dense_seed_runs_and_returns_dense():
    core = _build_welford_core(is_diagonal=False)
    seed_imm = jnp.diag(jnp.array([0.5, 3.0, 0.3, 1.7]))
    seeded = core.init(DIM)._replace(inverse_mass_matrix=seed_imm)
    results, _ = _run(core, num_steps=150, initial_metric_state=seeded)
    imm = np.asarray(results.parameters["inverse_mass_matrix"])
    assert imm.shape == (DIM, DIM)
    assert np.all(np.isfinite(imm))
    assert np.all(np.linalg.eigvalsh(imm) > 0)


def test_shrinkage_zero_is_stan_regularization():
    """shrinkage=0 reproduces the classic Stan blend exactly: the window
    estimate is count/(count+5)*cov + 5/(count+5)*1e-3*I."""
    from blackjax_tpu.adaptation.mass_matrix import mass_matrix_adaptation

    init, update, final = mass_matrix_adaptation(
        is_diagonal_matrix=True, imm_shrinkage_to_previous=0.0
    )
    state = init(DIM, None)
    draws = jax.random.normal(jax.random.key(0), (40, DIM)) * jnp.sqrt(VARIANCES)
    for row in draws:
        state = update(state, row, None)
    out = final(state)
    n = draws.shape[0]
    sample_var = np.var(np.asarray(draws), axis=0, ddof=1)
    expected = (n / (n + 5.0)) * sample_var + (5.0 / (n + 5.0)) * 1e-3
    np.testing.assert_allclose(
        np.asarray(out.inverse_mass_matrix), expected, rtol=1e-5
    )


@pytest.mark.parametrize("shrink", [5.0, 50.0])
def test_shrinkage_pulls_toward_previous_imm(shrink):
    """With pseudo-count shrinkage the window-end estimate is pulled toward
    the PREVIOUS IMM (here: the seed), monotonically in the pseudo-count."""
    from blackjax_tpu.adaptation.mass_matrix import mass_matrix_adaptation

    prev = jnp.full((DIM,), 7.0)
    draws = jax.random.normal(jax.random.key(0), (40, DIM)) * jnp.sqrt(VARIANCES)

    def blended(s):
        init, update, final = mass_matrix_adaptation(
            is_diagonal_matrix=True, imm_shrinkage_to_previous=s
        )
        state = init(DIM, prev)
        for row in draws:
            state = update(state, row, None)
        return np.asarray(final(state).inverse_mass_matrix)

    out = blended(shrink)
    out0 = blended(0.0)
    # pulled strictly toward prev relative to the unshrunk estimate
    assert np.all(np.abs(out - np.asarray(prev)) < np.abs(out0 - np.asarray(prev)))
    # and the pull grows with the pseudo-count
    if shrink == 50.0:
        out5 = blended(5.0)
        assert np.all(
            np.abs(out - np.asarray(prev)) < np.abs(out5 - np.asarray(prev))
        )


def test_f32_second_call_is_idempotent():
    """Two identical f32 runs give identical results (no hidden host
    state in the engine; the reference pins this for dtype hygiene)."""
    core = _build_welford_core(is_diagonal=True)
    r1, _ = _run(core, num_steps=80)
    r2, _ = _run(core, num_steps=80)
    np.testing.assert_array_equal(
        np.asarray(r1.parameters["step_size"]),
        np.asarray(r2.parameters["step_size"]),
    )
    np.testing.assert_array_equal(
        np.asarray(r1.parameters["inverse_mass_matrix"]),
        np.asarray(r2.parameters["inverse_mass_matrix"]),
    )
