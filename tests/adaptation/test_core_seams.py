"""Metric-core finalization and staged-engine seams: ``final`` buffer reset
semantics, mu_star centering, the ``schedule_fn`` override, and the
``initial_metric_state`` warm-start seam
(mirrors ``tests/adaptation/test_low_rank_recipes.py:299-977`` scenario
classes in the reference).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.metric_recipes import (
    LowRankMetricCoreState,
    lookup_recipe,
)
from blackjax_tpu.adaptation.staged_adaptation import build_schedule, staged_adaptation

D = 4
LOW_RANK_RECIPES = ["fisher_low_rank", "sample_cov_low_rank"]


def _core(name, **opts):
    recipe = lookup_recipe(name)
    defaults = dict(buffer_size=16)
    defaults.update(opts)
    return recipe.build_core(**defaults)


def _feed(core, state, rng_key, n):
    """Push n synthetic draw/grad pairs with anisotropic scales."""
    scales = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    keys = jax.random.split(rng_key, n)
    for key in keys:
        draw = scales * jax.random.normal(key, (D,))
        grad = -draw / scales**2
        state = core.update(state, draw, grad)
    return state


# --- final(): reset + recompute semantics -----------------------------------
@pytest.mark.parametrize("name", LOW_RANK_RECIPES)
def test_final_resets_buffers_and_counters(name, rng_key):
    core = _core(name)
    state = _feed(core, core.init(D), rng_key, 8)
    assert int(state.buffer_idx) == 8
    out = core.final(state)
    assert isinstance(out, LowRankMetricCoreState)
    assert int(out.buffer_idx) == 0
    np.testing.assert_array_equal(np.asarray(out.draws_buffer), 0.0)
    np.testing.assert_array_equal(np.asarray(out.grads_buffer), 0.0)


@pytest.mark.parametrize("name", LOW_RANK_RECIPES)
def test_final_emits_nonidentity_metric_from_filled_buffer(name, rng_key):
    core = _core(name)
    state = _feed(core, core.init(D), rng_key, 16)
    out = core.final(state)
    sigma = np.asarray(out.inverse_mass_matrix.sigma)
    assert np.isfinite(sigma).all() and (sigma > 0).all()
    # anisotropic data must move sigma off the identity
    assert not np.allclose(sigma, 1.0)


@pytest.mark.parametrize("name", LOW_RANK_RECIPES)
def test_final_with_underfilled_buffer_keeps_identity(name, rng_key):
    """Fewer than 3 rows cannot support a recompute: the payload must stay
    at its init value rather than emit garbage."""
    core = _core(name)
    state = _feed(core, core.init(D), rng_key, 2)
    out = core.final(state)
    np.testing.assert_array_equal(np.asarray(out.inverse_mass_matrix.sigma), 1.0)
    # ... but the buffers still reset for the next window
    assert int(out.buffer_idx) == 0


def test_fisher_final_centers_mu_star(rng_key):
    """The Fisher core's regularization center tracks the buffered draws."""
    core = _core("fisher_low_rank")
    offset = jnp.asarray([3.0, -2.0, 1.0, 0.5])
    state = core.init(D)
    keys = jax.random.split(rng_key, 16)
    for key in keys:
        draw = offset + 0.1 * jax.random.normal(key, (D,))
        state = core.update(state, draw, -(draw - offset) / 0.01)
    out = core.final(state)
    np.testing.assert_allclose(np.asarray(out.mu_star), np.asarray(offset), atol=0.2)


def test_sample_cov_final_mu_star_stays_zero(rng_key):
    """Scheme-B (sample covariance) emits an uncentered payload: mu_star is
    identically zero no matter the data."""
    core = _core("sample_cov_low_rank")
    state = _feed(core, core.init(D), jax.random.fold_in(rng_key, 1), 16)
    out = core.final(state)
    np.testing.assert_array_equal(np.asarray(out.mu_star), 0.0)


@pytest.mark.parametrize("name", LOW_RANK_RECIPES)
def test_engine_reuse_after_final(name, rng_key):
    """update -> final -> update must keep working with the same shapes
    (the staged engine reuses one core across every slow window)."""
    core = _core(name)
    k1, k2 = jax.random.split(rng_key)
    state = core.final(_feed(core, core.init(D), k1, 16))
    state = _feed(core, state, k2, 16)
    assert int(state.buffer_idx) == 16
    out = core.final(state)
    assert np.isfinite(np.asarray(out.inverse_mass_matrix.sigma)).all()


@pytest.mark.parametrize("name", LOW_RANK_RECIPES)
def test_final_is_jittable_fixed_shape(name, rng_key):
    core = _core(name)
    state = _feed(core, core.init(D), rng_key, 16)
    out_eager = core.final(state)
    out_jit = jax.jit(core.final)(state)
    np.testing.assert_allclose(
        np.asarray(out_jit.inverse_mass_matrix.sigma),
        np.asarray(out_eager.inverse_mass_matrix.sigma),
        rtol=1e-6,
    )


# --- staged engine seams -----------------------------------------------------
def _logdensity(x):
    scales = jnp.asarray([0.5, 1.0, 2.0, 4.0])
    return -0.5 * jnp.sum((x / scales) ** 2)


def test_custom_schedule_fn_is_called_and_honored(rng_key):
    calls = []

    def tracking_schedule(num_steps):
        calls.append(num_steps)
        return build_schedule(num_steps)

    warmup = staged_adaptation(
        blackjax_tpu.nuts,
        _logdensity,
        schedule_fn=tracking_schedule,
        max_num_doublings=5,
    )
    (state, params), _ = warmup.run(rng_key, jnp.ones(D), num_steps=200)
    assert calls == [200]
    assert 0.05 < float(params["step_size"]) < 10.0


def test_all_fast_schedule_disables_metric_adaptation(rng_key):
    """A schedule with no slow windows must leave the metric at identity."""

    def all_fast(num_steps):
        return jnp.zeros((num_steps, 2), jnp.int32)

    warmup = staged_adaptation(
        blackjax_tpu.nuts, _logdensity, schedule_fn=all_fast, max_num_doublings=5
    )
    (state, params), _ = warmup.run(rng_key, jnp.ones(D), num_steps=150)
    np.testing.assert_array_equal(np.asarray(params["inverse_mass_matrix"]), 1.0)


def test_initial_metric_state_seam_overrides_init(rng_key):
    """A warm core state passed through ``initial_metric_state`` must seed
    the engine (visible when the schedule never recomputes: the final
    parameters keep the warm payload instead of identity)."""
    recipe = lookup_recipe("welford_diag")
    core = recipe.build_core()
    warm = core.init(D)

    # an all-fast schedule never finalizes a slow window, so whatever metric
    # the engine starts with is what it ends with
    def all_fast(num_steps):
        return jnp.zeros((num_steps, 2), jnp.int32)

    warmup_cold = staged_adaptation(
        blackjax_tpu.nuts, _logdensity, schedule_fn=all_fast, max_num_doublings=5
    )
    (_, params_cold), _ = warmup_cold.run(rng_key, jnp.ones(D), num_steps=100)

    warm = warm._replace(inverse_mass_matrix=jnp.asarray([0.25, 1.0, 4.0, 16.0]))
    warmup_warm = staged_adaptation(
        blackjax_tpu.nuts,
        _logdensity,
        schedule_fn=all_fast,
        initial_metric_state=warm,
        max_num_doublings=5,
    )
    (_, params_warm), _ = warmup_warm.run(rng_key, jnp.ones(D), num_steps=100)

    np.testing.assert_array_equal(np.asarray(params_cold["inverse_mass_matrix"]), 1.0)
    np.testing.assert_allclose(
        np.asarray(params_warm["inverse_mass_matrix"]),
        np.asarray([0.25, 1.0, 4.0, 16.0]),
    )


def test_default_schedule_is_stan_windows():
    """The default schedule is Stan's three-phase layout: fast buffer, then
    doubling slow windows each closed by a middle-window-end flag, then a
    final fast buffer."""
    sched = np.asarray(build_schedule(300))
    labels, closes = sched[:, 0], sched[:, 1]
    assert labels[0] == 0 and labels[-1] == 0 and (labels == 1).any()
    # every window close happens on a slow step, and the slow phase is
    # contiguous between the two fast buffers
    assert (labels[closes == 1] == 1).all()
    slow = np.flatnonzero(labels == 1)
    assert np.array_equal(slow, np.arange(slow[0], slow[-1] + 1))
    # the last slow step closes the last window
    assert closes[slow[-1]] == 1
