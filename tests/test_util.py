"""Utility-layer tests: the inference runner, streaming expectations,
thinning, and PSIS-weight normalization helpers.

Parity model: reference ``tests/test_util.py``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.util import (
    incremental_value_update,
    linear_map,
    run_inference_algorithm,
    store_only_expectation_values,
    thin_algorithm,
)


def _logdensity(x):
    return -0.5 * jnp.sum(x**2)


class TestRunInference:
    def test_compatible_with_initial_pos(self, rng_key):
        algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
        final, (states, infos) = run_inference_algorithm(
            rng_key, algo, 50, initial_position=jnp.ones(3)
        )
        assert states.position.shape == (50, 3)

    def test_compatible_with_initial_state(self, rng_key):
        algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
        state = algo.init(jnp.ones(3))
        final, (states, infos) = run_inference_algorithm(
            rng_key, algo, 50, initial_state=state
        )
        assert states.position.shape == (50, 3)

    def test_rejects_both_and_neither(self, rng_key):
        algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
        state = algo.init(jnp.ones(3))
        with pytest.raises(ValueError):
            run_inference_algorithm(
                rng_key, algo, 10, initial_state=state, initial_position=jnp.ones(3)
            )
        with pytest.raises(ValueError):
            run_inference_algorithm(rng_key, algo, 10)


class TestStreaming:
    def test_streaming_expectations_match_trace(self, rng_key):
        """store_only_expectation_values's running means must equal the
        post-hoc means of the full trace."""
        algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
        init_state = algo.init(jnp.ones(3))

        streaming_algo, transform = store_only_expectation_values(
            algo,
            state_transform=lambda s: {
                "mean": s.position,
                "second_moment": s.position**2,
            },
        )
        stream_state = streaming_algo.init(init_state)
        _, (states_trace, _) = run_inference_algorithm(
            rng_key, algo, 200, initial_state=init_state
        )
        final_stream, _ = run_inference_algorithm(
            rng_key, streaming_algo, 200, initial_state=stream_state
        )
        trace_pos = np.asarray(states_trace.position)
        _, streamed = final_stream.streaming_avg
        # f32: incremental averaging accumulates ~1e-4 relative rounding
        # vs the post-hoc mean over 200 steps
        tol = 1e-5 if jax.config.jax_enable_x64 else 5e-4
        np.testing.assert_allclose(
            np.asarray(streamed["mean"]), trace_pos.mean(0), rtol=tol
        )
        np.testing.assert_allclose(
            np.asarray(streamed["second_moment"]),
            (trace_pos**2).mean(0),
            rtol=tol,
        )


class TestThinning:
    def test_thin(self, rng_key):
        algo = blackjax_tpu.mala(_logdensity, step_size=0.3)
        thinned = thin_algorithm(algo, num_inner_steps=5)
        state = thinned.init(jnp.ones(3))
        final, (states, infos) = run_inference_algorithm(
            rng_key, thinned, 20, initial_state=state
        )
        # 20 emitted states, each 5 kernel steps apart
        assert states.position.shape == (20, 3)
        # thinned chain decorrelates faster than the unthinned one
        raw_final, (raw_states, _) = run_inference_algorithm(
            rng_key, algo, 100, initial_state=algo.init(jnp.ones(3))
        )
        from blackjax_tpu.diagnostics import effective_sample_size

        ess_thin = float(
            effective_sample_size(np.asarray(states.position)[None, :, 0])
        )
        ess_raw = float(
            effective_sample_size(np.asarray(raw_states.position)[None, :, 0])
        )
        assert ess_thin / 20 > ess_raw / 100  # per-sample efficiency


class TestHelpers:
    def test_linear_map_diag_vs_dense(self):
        d = jnp.array([1.0, 2.0, 3.0])
        x = jnp.array([1.0, 1.0, 1.0])
        np.testing.assert_allclose(
            np.asarray(linear_map(d, x)), np.asarray(linear_map(jnp.diag(d), x))
        )

    def test_incremental_value_update_weighted_mean(self):
        total, avg = 0.0, jnp.zeros(2)
        values = [jnp.ones(2), 3.0 * jnp.ones(2), 5.0 * jnp.ones(2)]
        weights = [1.0, 2.0, 1.0]
        for v, w in zip(values, weights):
            total, avg = incremental_value_update(v, (total, avg), weight=w)
        expected = (1 * 1 + 3 * 2 + 5 * 1) / 4
        np.testing.assert_allclose(np.asarray(avg), expected, rtol=1e-6)

    def test_incremental_value_update_zero_prevention(self):
        total, avg = incremental_value_update(
            jnp.ones(2), (0.0, jnp.zeros(2)), weight=0.0, zero_prevention=1.0
        )
        assert not bool(jnp.any(jnp.isnan(avg)))


class TestSmallUtilities:
    def test_gaussian_noise_pytree_and_scales(self, rng_key):
        from blackjax_tpu.util import generate_gaussian_noise

        pos = {"a": jnp.zeros(3), "b": jnp.zeros((2, 2))}
        out = jax.tree.map(lambda *_: None, pos)  # structure probe
        noise = generate_gaussian_noise(rng_key, pos)
        assert jax.tree.structure(noise) == jax.tree.structure(pos)
        # dense scale: covariance of the flat draw is sigma sigma^T
        sigma = jnp.array([[2.0, 0.0], [1.0, 1.0]])
        draws = jax.vmap(
            lambda k: generate_gaussian_noise(k, jnp.zeros(2), sigma=sigma)
        )(jax.random.split(rng_key, 20000))
        emp = np.cov(np.asarray(draws).T)
        np.testing.assert_allclose(emp, np.asarray(sigma @ sigma.T), atol=0.1)

    def test_unit_vector_has_unit_norm(self, rng_key):
        from blackjax_tpu.util import generate_unit_vector

        pos = {"a": jnp.zeros(5), "b": jnp.zeros(3)}
        u = generate_unit_vector(rng_key, pos)
        flat = np.concatenate([np.asarray(u["a"]), np.asarray(u["b"])])
        np.testing.assert_allclose(np.linalg.norm(flat), 1.0, rtol=1e-6)

    def test_pytree_size_and_index(self):
        from blackjax_tpu.util import index_pytree, pytree_size

        pos = {"a": jnp.zeros((2, 3)), "b": jnp.zeros(4)}
        assert pytree_size(pos) == 10
        idx = index_pytree(pos)
        flat = np.concatenate(
            [np.asarray(idx["a"]).ravel(), np.asarray(idx["b"]).ravel()]
        )
        np.testing.assert_array_equal(np.sort(flat), np.arange(10))
