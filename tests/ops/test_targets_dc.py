"""Matmul-class dc targets (logistic regression + Finnish horseshoe):
tile-vs-autodiff exactness, permutation consistency with the model-layout
target, and full in-kernel runs in interpret mode.

The tile functions are plain jnp closures, so the value/gradient checks
run them OUTSIDE Pallas against ``jax.grad`` of the reference spelling —
an exact (to f32 rounding) check, much sharper than the statistical
kernel-level protocol of ``test_fused_nuts_dc.py`` (which the full-run
tests here mirror at small scale).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.ops.fused_leapfrog import _round_up
from blackjax_tpu.ops.fused_nuts_dc import fused_nuts_run_dc
from blackjax_tpu.ops.targets_dc import (
    eight_schools_dc_perm,
    horseshoe_dc_perm,
    make_eight_schools_target_dc,
    make_finnish_horseshoe_target_dc,
    make_logreg_target_dc,
)

T = 8  # lanes (chains) for the tile-level checks


def _tile_harness(target, positions):
    """Replicate the runner's operand prep: positions (C, d) ->
    (x (d_pad, C), mask, padded params)."""
    C, d = positions.shape
    d_pad = _round_up(d, 8)
    x = jnp.pad(positions.astype(jnp.float32).T, ((0, d_pad - d), (0, 0)))
    rowid = jax.lax.broadcasted_iota(jnp.int32, (d_pad, C), 0)
    mask = (rowid < d).astype(jnp.float32)

    params = []
    for p in target.params:
        a = jnp.asarray(p, jnp.float32)
        if a.ndim == 1:
            rows = _round_up(a.shape[0], 8)
            a = jnp.broadcast_to(
                jnp.pad(a, (0, rows - a.shape[0]))[:, None], (rows, C)
            )
        params.append(a)
    return x, mask, tuple(params)


def _check_tiles_match_autodiff(target, positions, ld_atol, grad_rtol):
    x, mask, params = _tile_harness(target, positions)
    f32 = positions.astype(jnp.float32)

    ld_tile = np.asarray(target.logdensity_tile(x, mask, *params)).ravel()
    ld_ref = np.asarray(jax.vmap(target.logdensity_fn)(f32))
    np.testing.assert_allclose(ld_tile, ld_ref, atol=ld_atol, rtol=1e-5)

    g_tile = np.asarray(target.grad_tile(x, mask, *params))
    g_ref = np.asarray(jax.vmap(jax.grad(target.logdensity_fn))(f32))
    d = positions.shape[1]
    np.testing.assert_allclose(
        g_tile[:d].T, g_ref, rtol=grad_rtol, atol=ld_atol
    )
    # padded rows carry zero gradient
    np.testing.assert_array_equal(np.asarray(g_tile[d:]), 0.0)

    ld_vg, g_vg = target.vg_tile(x, mask, *params)
    np.testing.assert_array_equal(np.asarray(ld_vg).ravel(), ld_tile)
    np.testing.assert_array_equal(np.asarray(g_vg), g_tile)


def test_logreg_dc_tiles_match_autodiff(rng_key):
    k1, k2, k3 = jax.random.split(rng_key, 3)
    n, d = 23, 12  # deliberately not sublane/lane multiples
    X = jax.random.normal(k1, (n, d))
    w_true = jax.random.normal(k2, (d,))
    y = (jax.random.uniform(k3, (n,)) < jax.nn.sigmoid(X @ w_true)).astype(
        jnp.float32
    )
    target = make_logreg_target_dc(np.asarray(X), np.asarray(y))
    positions = 0.5 * jax.random.normal(rng_key, (T, d))
    _check_tiles_match_autodiff(target, positions, ld_atol=1e-3, grad_rtol=2e-3)


def test_horseshoe_dc_tiles_match_autodiff(rng_key):
    target = make_finnish_horseshoe_target_dc(num_points=12, num_predictors=16)
    positions = 0.3 * jax.random.normal(rng_key, (T, target.dim))
    _check_tiles_match_autodiff(target, positions, ld_atol=5e-2, grad_rtol=5e-3)


def test_eight_schools_dc_tiles_match_autodiff(rng_key):
    target = make_eight_schools_target_dc()
    positions = 0.5 * jax.random.normal(rng_key, (T, target.dim))
    _check_tiles_match_autodiff(target, positions, ld_atol=1e-3, grad_rtol=2e-3)


def test_eight_schools_dc_permutation_matches_model_target(rng_key):
    from blackjax_tpu.models.targets import eight_schools_noncentered

    dc = make_eight_schools_target_dc()
    model = eight_schools_noncentered()
    to_dc, from_dc = eight_schools_dc_perm()
    x_model = 0.5 * jax.random.normal(rng_key, (5, 10)).astype(jnp.float32)
    x_dc = x_model[:, to_dc]
    np.testing.assert_allclose(
        np.asarray(jax.vmap(dc.logdensity_fn)(x_dc)),
        np.asarray(jax.vmap(model.logdensity_fn)(x_model)),
        rtol=2e-5,
        atol=1e-3,
    )
    np.testing.assert_array_equal(x_dc[:, from_dc], x_model)


def test_horseshoe_dc_rejects_unaligned_m():
    with pytest.raises(ValueError, match="multiple of 8"):
        make_finnish_horseshoe_target_dc(num_points=12, num_predictors=10)


def test_horseshoe_dc_permutation_matches_model_target(rng_key):
    """The dc layout is the model-layout posterior under ``horseshoe_dc_perm``
    (same default dataset => identical log-density values)."""
    from blackjax_tpu.models.targets import finnish_horseshoe

    N, M = 12, 16
    dc = make_finnish_horseshoe_target_dc(num_points=N, num_predictors=M)
    model = finnish_horseshoe(num_points=N, num_predictors=M)
    to_dc, from_dc = horseshoe_dc_perm(M)

    x_model = 0.3 * jax.random.normal(rng_key, (5, model.dim)).astype(
        jnp.float32
    )
    x_dc = x_model[:, to_dc]
    np.testing.assert_allclose(
        np.asarray(jax.vmap(dc.logdensity_fn)(x_dc)),
        np.asarray(jax.vmap(model.logdensity_fn)(x_model)),
        rtol=2e-5,
        atol=1e-3,
    )
    # round trip
    np.testing.assert_array_equal(x_dc[:, from_dc], x_model)


@pytest.mark.parametrize("which", ["logreg", "horseshoe", "eight_schools"])
def test_matmul_target_full_kernel_interpret(which, rng_key):
    """The whole NUTS machine runs on the matmul-class targets (interpret
    mode): budget completes, history finite, mean trajectory length agrees
    with the XLA engine on the same configuration."""
    if which == "logreg":
        k1, k2, k3 = jax.random.split(jax.random.key(2), 3)
        n, d = 24, 8
        X = jax.random.normal(k1, (n, d))
        y = (
            jax.random.uniform(k3, (n,))
            < jax.nn.sigmoid(X @ jax.random.normal(k2, (d,)))
        ).astype(jnp.float32)
        target = make_logreg_target_dc(np.asarray(X), np.asarray(y))
        step_size, pos_scale = 0.3, 0.5
    elif which == "eight_schools":
        target = make_eight_schools_target_dc()
        step_size, pos_scale = 0.2, 0.5
    else:
        target = make_finnish_horseshoe_target_dc(
            num_points=12, num_predictors=16
        )
        step_size, pos_scale = 0.05, 0.1

    C, S = 16, 12
    d = target.dim
    x0 = pos_scale * jax.random.normal(rng_key, (C, d))
    fx, hist, grads, steps = fused_nuts_run_dc(
        x0,
        jnp.ones(d),
        step_size,
        target=target,
        num_steps=S,
        max_num_doublings=5,
        seed=3,
        num_track=min(8, d),
        budget=S * 40,
        chunk=16,
        interpret=True,
    )
    assert (np.asarray(steps) == S).all(), "iteration budget exhausted"
    assert np.isfinite(np.asarray(hist)).all()
    fused_mean_len = float(grads) / (C * S)

    # XLA engine at the same configuration
    import blackjax_tpu

    algo = blackjax_tpu.nuts(
        target.logdensity_fn,
        step_size=step_size,
        inverse_mass_matrix=jnp.ones(d),
        max_num_doublings=5,
    )
    states = jax.vmap(algo.init)(x0)

    def one(states, key):
        keys = jax.random.split(key, C)
        states, infos = jax.vmap(algo.step)(keys, states)
        return states, jnp.sum(infos.num_integration_steps)

    _, nsteps = jax.lax.scan(
        one, states, jax.random.split(jax.random.key(7), S)
    )
    xla_mean_len = float(jnp.sum(nsteps)) / (C * S)
    assert fused_mean_len == pytest.approx(xla_mean_len, rel=0.5)
