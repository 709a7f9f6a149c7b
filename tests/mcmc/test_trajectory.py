"""Straight-line vs loop spelling of :func:`static_integration`.

A Python-int trip count <= 64 is emitted as straight-line code (no
``fori_loop``); XLA may fma-contract across the step boundary, so the
contract is <=1 ULP per step vs the loop spelling, not bitwise identity
(reference analogue: ``blackjax/mcmc/trajectory.py:66-90`` has only the
loop spelling). These tests pin that contract directly — the bit-identity
tests in ``tests/mcmc/test_nuts.py`` cover the fused NUTS machine, not
this path.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.mcmc import integrators, metrics, trajectory

D = 7
LOGDENSITY = lambda x: -0.5 * jnp.sum(x**2 * (1.0 + jnp.arange(D)))


def _make_state(rng_key):
    metric = metrics.default_metric(jnp.ones(D))
    integrator = integrators.velocity_verlet(LOGDENSITY, metric.kinetic_energy)
    pos = 0.4 * jax.random.normal(rng_key, (D,))
    mom = metric.sample_momentum(jax.random.fold_in(rng_key, 1), pos)
    state = integrators.new_integrator_state(LOGDENSITY, pos, mom)
    return integrator, state


@pytest.mark.parametrize("n_steps", [1, 10, 64])
def test_straight_line_matches_loop(rng_key, n_steps):
    integrator, state = _make_state(rng_key)
    integrate = trajectory.static_integration(integrator)
    # Python int <= 64 -> straight-line emission; a traced scalar forces
    # the fori_loop spelling. Jit both so the comparison is compiled-XLA
    # vs compiled-XLA (the regime the straight-line path exists for).
    straight = jax.jit(lambda s: integrate(s, 0.1, n_steps))(state)
    looped = jax.jit(
        lambda s, n: integrate(s, 0.1, n), static_argnums=()
    )(state, jnp.asarray(n_steps))
    for a, b in zip(jax.tree.leaves(straight), jax.tree.leaves(looped)):
        a, b = np.asarray(a), np.asarray(b)
        # <=1 ULP per step of accumulated fma-contraction drift. The ULP
        # scale is the LEAF's max magnitude, not each element's own: a
        # coordinate that lands near zero is computed from O(max|leaf|)
        # intermediates, so its absolute drift is bounded by their
        # spacing, not by spacing(~0) (seed 20260820 exposed this).
        scale = max(np.max(np.abs(a)), np.max(np.abs(b)), 1e-12)
        tol = n_steps * np.spacing(scale)
        err = np.abs(a - b)
        assert np.all(err <= tol), (
            f"straight-line vs loop drift {err.max()} exceeds "
            f"{n_steps}-step ULP budget {tol.max()}"
        )


def test_straight_line_not_taken_above_64(rng_key):
    # >64 static steps must fall back to the loop (compile-size guard):
    # results are then trivially bitwise-equal to the traced-count loop
    integrator, state = _make_state(rng_key)
    integrate = trajectory.static_integration(integrator)
    a = jax.jit(lambda s: integrate(s, 0.05, 65))(state)
    b = jax.jit(lambda s, n: integrate(s, 0.05, n))(state, jnp.asarray(65))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
