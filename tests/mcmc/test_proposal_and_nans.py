"""Proposal-layer semantics and unadjusted-sampler NaN guards.

Parity model: reference ``tests/mcmc/test_proposal.py`` (progressive sampler
probabilities, safe energy differences) and ``test_mclmc_nan_fix_969.py``
(non-finite transitions revert instead of propagating).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc import mclmc
from blackjax_tpu.mcmc.proposal import (
    Proposal,
    progressive_biased_sampling,
    progressive_uniform_sampling,
    proposal_generator,
    safe_energy_diff,
)


class TestProposal:
    def test_safe_energy_diff_nan_to_neg_inf(self):
        assert float(safe_energy_diff(1.0, jnp.nan)) == -jnp.inf
        assert float(safe_energy_diff(1.0, 3.0)) == -2.0
        # -inf new energy would give +inf weight; kept finite-positive
        assert np.isfinite(float(safe_energy_diff(jnp.inf, 3.0))) or float(
            safe_energy_diff(jnp.inf, 3.0)
        ) == jnp.inf

    def test_update_weight_is_energy_difference(self):
        energy_fn = lambda s: jnp.asarray(s, jnp.float32)
        new, update = proposal_generator(energy_fn)
        p0 = new(2.0)
        assert float(p0.weight) == 0.0 and float(p0.sum_log_p_accept) == -jnp.inf
        p1 = update(2.0, 5.0)  # H0=2, H=5 -> weight -3
        assert float(p1.weight) == -3.0
        assert float(p1.sum_log_p_accept) == -3.0
        p2 = update(2.0, 1.0)  # better energy: weight +1, slpa capped at 0
        assert float(p2.weight) == 1.0 and float(p2.sum_log_p_accept) == 0.0

    @pytest.mark.parametrize(
        "sampler,expected",
        [
            (progressive_uniform_sampling, lambda wn, wo: jax.nn.sigmoid(wn - wo)),
            (
                progressive_biased_sampling,
                lambda wn, wo: min(1.0, float(jnp.exp(wn - wo))),
            ),
        ],
    )
    def test_progressive_sampling_probabilities(self, rng_key, sampler, expected):
        """Empirical acceptance frequency matches the scheme's probability."""
        w_old, w_new = -1.0, -2.0
        old = Proposal(jnp.zeros(2), 1.0, w_old, -0.5)
        new = Proposal(jnp.ones(2), 2.0, w_new, -0.7)
        picks = []
        for i in range(600):
            out = sampler(jax.random.fold_in(rng_key, i), old, new)
            picks.append(float(out.state[0]))
        freq = sum(picks) / len(picks)
        assert abs(freq - float(expected(w_new, w_old))) < 0.07
        # merged statistics are scheme-independent
        out = sampler(rng_key, old, new)
        assert float(out.weight) == pytest.approx(
            float(jnp.logaddexp(w_old, w_new)), rel=1e-6
        )


class TestMCLMCNaNGuards:
    def test_nan_transition_reverts(self, rng_key):
        """A step into a NaN region must keep the previous state and flag
        info.nonans=False instead of propagating the NaN."""

        def logdensity(x):
            # finite near 0; NaN once |x_0| > 1
            return jnp.where(
                jnp.abs(x[0]) < 1.0, -0.5 * jnp.sum(x**2), jnp.nan
            )

        kernel = mclmc.build_kernel()
        state = mclmc.init(jnp.zeros(3), logdensity, rng_key)
        # absurd step size guarantees leaving the finite region; the NaN
        # energy change fails the high-energy comparison FIRST (reference
        # guard ordering), so the transition reverts there and the state
        # stays finite
        new_state, info = kernel(
            rng_key, state, logdensity, jnp.ones(3), L=1.0, step_size=100.0
        )
        np.testing.assert_allclose(
            np.asarray(new_state.position), np.asarray(state.position)
        )
        assert np.isfinite(float(new_state.logdensity))
        assert np.isfinite(float(info.energy_change))

    def test_high_energy_guard_reverts(self, rng_key):
        """With a finite desired_energy_var_max_ratio, an energy spike
        reverts the transition."""
        logdensity = lambda x: -0.5 * jnp.sum(x**2)
        kernel = mclmc.build_kernel(desired_energy_var_max_ratio=1.0)
        state = mclmc.init(100.0 * jnp.ones(3), logdensity, rng_key)
        new_state, info = kernel(
            rng_key, state, logdensity, jnp.ones(3), L=1.0, step_size=10.0
        )
        # enormous energy change at this step size: transition reverted
        np.testing.assert_allclose(
            np.asarray(new_state.position), np.asarray(state.position)
        )

    def test_finite_region_steps_normally(self, rng_key):
        logdensity = lambda x: -0.5 * jnp.sum(x**2)
        kernel = mclmc.build_kernel()
        state = mclmc.init(jnp.ones(3), logdensity, rng_key)
        new_state, info = kernel(
            rng_key, state, logdensity, jnp.ones(3), L=1.0, step_size=0.1
        )
        assert bool(info.nonans)
        assert not np.allclose(
            np.asarray(new_state.position), np.asarray(state.position)
        )
