"""window_adaptation_low_rank shim <-> staged-engine parity.

The shim's whole contract is delegation: it must be EXACTLY the staged
engine configured with the matching fisher-low-rank core (reset or
accumulating), plus the mu*-re-centering of the returned state. The
reference pins this with per-step trace equality in both directions
(``/root/reference/tests/adaptation/test_low_rank_recipes.py:1517-2052``,
Reset/Accumulating parity classes); same protocol here.

Also pins nutpie's gradient-based init seam: ``seed_low_rank_sigma_from_
grad`` algebra (``metric_recipes.py:93``) and its first-step visibility
through the engine.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.low_rank_adaptation import (
    _accumulating_buffer_capacity,
    build_growing_window_schedule,
    window_adaptation_low_rank,
)
from blackjax_tpu.adaptation.metric_recipes import (
    _build_fisher_low_rank_accumulating_core,
    _build_fisher_low_rank_core,
    seed_low_rank_sigma_from_grad,
)
from blackjax_tpu.adaptation.staged_adaptation import (
    build_schedule,
    staged_adaptation,
)
from blackjax_tpu.mcmc import nuts as nuts_mod

DIM = 5
SCALES = jnp.array([1.0, 2.0, 0.5, 1.5, 0.8])


def logdensity(x):
    return -0.5 * jnp.sum((x / SCALES) ** 2)


NUM_STEPS = 120
POSITION = jnp.ones(DIM)


def _run_shim(buffer_policy, **kw):
    warmup = window_adaptation_low_rank(
        nuts_mod,
        logdensity,
        max_rank=2,
        buffer_policy=buffer_policy,
        schedule_fn=(
            build_growing_window_schedule
            if buffer_policy == "accumulating"
            else build_schedule
        ),
        **kw,
    )
    return warmup.run(jax.random.key(7), POSITION, NUM_STEPS)


def _run_engine_manually(buffer_policy):
    """Reconstruct the exact staged configuration the shim delegates to
    (low_rank_adaptation.py:153-194) and run it directly."""
    if buffer_policy == "accumulating":
        schedule = build_growing_window_schedule(NUM_STEPS)
        core = _build_fisher_low_rank_accumulating_core(
            buffer_size=max(_accumulating_buffer_capacity(schedule), 1),
            max_rank=2,
            gamma=1e-5,
            cutoff=2.0,
            recompute_every=1,
        )
        schedule_fn = lambda n: schedule
    else:
        typical_window = max(NUM_STEPS // 5, 128)
        core = _build_fisher_low_rank_core(
            buffer_size=min(typical_window * 2, NUM_STEPS),
            max_rank=2,
            gamma=1e-5,
            cutoff=2.0,
        )
        schedule_fn = build_schedule
    engine = staged_adaptation(
        nuts_mod, logdensity, metric=core, schedule_fn=schedule_fn
    )
    return engine.run(jax.random.key(7), POSITION, NUM_STEPS)


@pytest.mark.parametrize("buffer_policy", ["reset", "accumulating"])
def test_shim_equals_engine_per_step_and_final(buffer_policy):
    results, info = _run_shim(buffer_policy)
    results_m, info_m = _run_engine_manually(buffer_policy)

    # final adapted parameters: identical, not merely close
    np.testing.assert_array_equal(
        np.asarray(results.parameters["step_size"]),
        np.asarray(results_m.parameters["step_size"]),
    )
    imm, imm_m = (
        r.parameters["inverse_mass_matrix"] for r in (results, results_m)
    )
    for field in ("sigma", "U", "lam"):
        np.testing.assert_array_equal(
            np.asarray(getattr(imm, field)),
            np.asarray(getattr(imm_m, field)),
            err_msg=field,
        )

    # per-step traces: the shim adds nothing and loses nothing
    np.testing.assert_array_equal(
        np.asarray(info.adaptation_state.step_size),
        np.asarray(info_m.adaptation_state.step_size),
    )
    trace, trace_m = info.adaptation_state.imm_state, info_m.adaptation_state.imm_state
    np.testing.assert_array_equal(
        np.asarray(trace.mu_star), np.asarray(trace_m.mu_star)
    )
    np.testing.assert_array_equal(
        np.asarray(trace.inverse_mass_matrix.sigma),
        np.asarray(trace_m.inverse_mass_matrix.sigma),
    )

    # the ONE divergence by contract: the shim re-centers the returned
    # chain state at mu* (optimal translation); the engine returns the
    # final chain position
    mu_star = np.asarray(trace.mu_star[-1])
    np.testing.assert_array_equal(np.asarray(results.state.position), mu_star)
    expected = nuts_mod.init(jnp.asarray(mu_star), logdensity)
    np.testing.assert_array_equal(
        np.asarray(results.state.logdensity), np.asarray(expected.logdensity)
    )


@pytest.mark.parametrize("buffer_policy", ["reset", "accumulating"])
def test_shim_info_buffers_are_dropped(buffer_policy):
    """The default info fn must strip the O(buffer * d) working buffers
    from the per-step trace (the scan would stack them every step)."""
    _, info = _run_shim(buffer_policy)
    assert info.adaptation_state.imm_state.draws_buffer is None
    assert info.adaptation_state.imm_state.grads_buffer is None


def test_gradient_based_init_seeds_sigma_at_first_step():
    """nutpie's gradient-based init: the FIRST step's sigma must already be
    1/sqrt(|grad(x0)|), not ones (visible through the info trace)."""
    _, info = _run_shim("reset", gradient_based_init=True)
    grad0 = jax.grad(logdensity)(POSITION)
    expected = 1.0 / jnp.sqrt(jnp.clip(jnp.abs(grad0), 1e-20, 1e20))
    first_sigma = np.asarray(info.adaptation_state.imm_state.inverse_mass_matrix.sigma)[0]
    # step 0's trace records the state BEFORE any window end recomputes it
    np.testing.assert_allclose(first_sigma, np.asarray(expected), rtol=1e-6)


class TestSeedSigmaFromGrad:
    def _state(self):
        core = _build_fisher_low_rank_core(
            buffer_size=8, max_rank=2, gamma=1e-5, cutoff=2.0
        )
        return core.init(DIM)

    def test_sigma_is_inverse_sqrt_grad_magnitude(self):
        grad = jnp.array([4.0, -9.0, 0.25, 1.0, -16.0])
        seeded = seed_low_rank_sigma_from_grad(self._state(), grad)
        np.testing.assert_allclose(
            np.asarray(seeded.inverse_mass_matrix.sigma),
            1.0 / np.sqrt(np.abs(np.asarray(grad))),
            rtol=1e-7,
        )

    def test_near_zero_grad_clips_not_infs(self):
        seeded = seed_low_rank_sigma_from_grad(self._state(), jnp.zeros(DIM))
        sigma = np.asarray(seeded.inverse_mass_matrix.sigma)
        assert np.all(np.isfinite(sigma))
        np.testing.assert_allclose(sigma, 1.0 / np.sqrt(1e-20))

    def test_u_lam_mu_star_and_buffers_unchanged(self):
        state = self._state()
        seeded = seed_low_rank_sigma_from_grad(state, jnp.arange(1.0, 6.0))
        np.testing.assert_array_equal(
            np.asarray(seeded.inverse_mass_matrix.U),
            np.asarray(state.inverse_mass_matrix.U),
        )
        np.testing.assert_array_equal(
            np.asarray(seeded.inverse_mass_matrix.lam),
            np.asarray(state.inverse_mass_matrix.lam),
        )
        np.testing.assert_array_equal(
            np.asarray(seeded.mu_star), np.asarray(state.mu_star)
        )
        np.testing.assert_array_equal(
            np.asarray(seeded.draws_buffer), np.asarray(state.draws_buffer)
        )
