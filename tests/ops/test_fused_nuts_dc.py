"""Transposed (dim, chains) in-kernel NUTS machine: documented equivalence
with the XLA engine (interpret mode on CPU).

Same protocol as ``test_fused_nuts.py`` — the dc kernel's randomness is an
independent counter stream, so the comparison is statistical: moment
recovery, trajectory-length distribution vs the XLA continuous runner,
and bookkeeping invariants. Marked slow: interpret mode executes the
machine per-element on CPU.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.ops.fused_nuts_dc import (
    fused_nuts_run_dc,
    make_gaussian_target_dc,
)

DIM = 4
VAR = jnp.array([1.0, 4.0, 0.25, 2.0])


@pytest.fixture(scope="module")
def fused_out():
    target = make_gaussian_target_dc(DIM, VAR)
    C, S = 24, 40
    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, DIM))
    return (
        fused_nuts_run_dc(
            x0,
            jnp.ones(DIM),
            0.4,
            target=target,
            num_steps=S,
            max_num_doublings=6,
            seed=3,
            num_track=DIM,
            tile_chains=128,
            budget=S * 64,
            chunk=32,
            interpret=True,
        ),
        C,
        S,
    )


def test_fused_nuts_dc_completes_and_recovers_moments(fused_out):
    (fx, hist, grads, steps), C, S = fused_out
    assert (np.asarray(steps) == S).all(), "iteration budget exhausted"
    h = np.asarray(hist)
    assert h.shape == (C, S, DIM)
    assert np.isfinite(h).all()
    pooled = h[:, S // 4 :, :].reshape(-1, DIM)
    np.testing.assert_allclose(pooled.var(0), np.asarray(VAR), rtol=0.35)
    np.testing.assert_allclose(pooled.mean(0), np.zeros(DIM), atol=0.4)


def test_fused_nuts_dc_trajectory_lengths_match_xla_engine(fused_out):
    """Mean leaves/transition must match the XLA flattened engine run at
    the same configuration (same target, step size, doubling cap)."""
    (fx, hist, grads, steps), C, S = fused_out
    fused_mean_len = float(grads) / (C * S)

    import blackjax_tpu

    logdensity = lambda x: -0.5 * jnp.sum(x**2 / VAR)
    algo = blackjax_tpu.nuts(
        logdensity,
        step_size=0.4,
        inverse_mass_matrix=jnp.ones(DIM),
        max_num_doublings=6,
    )
    x0 = 0.2 * jax.random.normal(jax.random.key(5), (C, DIM))
    states = jax.vmap(algo.init)(x0)

    def one(states, key):
        keys = jax.random.split(key, C)
        states, infos = jax.vmap(algo.step)(keys, states)
        return states, infos.num_integration_steps

    _, nsteps = jax.lax.scan(one, states, jax.random.split(jax.random.key(6), S))
    xla_mean_len = float(jnp.mean(nsteps.astype(jnp.float32)))
    np.testing.assert_allclose(fused_mean_len, xla_mean_len, rtol=0.15)


def test_fused_nuts_dc_final_state_consistent_with_history(fused_out):
    (fx, hist, grads, steps), C, S = fused_out
    np.testing.assert_allclose(
        np.asarray(fx)[:, :DIM], np.asarray(hist)[:, -1, :], rtol=1e-6
    )


def test_fused_nuts_dc_matches_cd_kernel_statistics(fused_out):
    """The two layouts implement the same machine: trajectory-length and
    variance statistics must agree (independent RNG streams)."""
    (fx, hist, grads, steps), C, S = fused_out
    from blackjax_tpu.ops.fused_leapfrog import make_gaussian_target
    from blackjax_tpu.ops.fused_nuts import fused_nuts_run

    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, DIM))
    fx2, hist2, grads2, steps2 = fused_nuts_run(
        x0,
        jnp.ones(DIM),
        0.4,
        target=make_gaussian_target(DIM, VAR),
        num_steps=S,
        max_num_doublings=6,
        seed=3,
        num_track=DIM,
        tile_chains=8,
        budget=S * 64,
        chunk=32,
        interpret=True,
    )
    np.testing.assert_allclose(
        float(grads) / (C * S), float(grads2) / (C * S), rtol=0.15
    )
    pooled = np.asarray(hist)[:, S // 4 :, :].reshape(-1, DIM)
    pooled2 = np.asarray(hist2)[:, S // 4 :, :].reshape(-1, DIM)
    np.testing.assert_allclose(pooled.var(0), pooled2.var(0), rtol=0.35)


def test_fused_nuts_dc_pack_is_exactly_unpacked(fused_out):
    """Slot packing (``pack`` logical chains per lane, chunk-boundary
    switching) must be a pure SCHEDULING change: per-chain RNG streams are
    keyed on the global chain id, so every output — final positions,
    history, per-chain grad counts, step counts — is bitwise identical to
    ``pack=1``. Includes a budget-exhaustion run: unreached chains return
    their initial position with zeroed history/steps, partial chains zero
    rows >= steps (the unpacked kernel's zero-init semantics)."""
    (out1, C, S) = fused_out
    target = make_gaussian_target_dc(DIM, VAR)
    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, DIM))
    common = dict(
        target=target, num_steps=S, max_num_doublings=6, seed=3,
        num_track=DIM, tile_chains=128, chunk=32, interpret=True,
    )
    out4 = fused_nuts_run_dc(
        x0, jnp.ones(DIM), 0.4, budget=4 * S * 64, pack=4, **common
    )
    for a, b, name in zip(out1, out4, ["final_x", "hist", "grads", "steps"]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )

    starved = fused_nuts_run_dc(
        x0, jnp.ones(DIM), 0.4, budget=96, pack=4, **common
    )
    fx, hist, _, steps = (np.asarray(o) for o in starved)
    assert steps.min() >= 0 and steps.max() <= S
    x0_np = np.asarray(x0)
    for c in np.nonzero(steps == 0)[0]:
        np.testing.assert_array_equal(fx[c], x0_np[c])
    for c in range(C):
        assert np.all(hist[c, steps[c]:, :] == 0.0), c


def test_fused_nuts_dc_restart_gating_is_exactly_ungated(fused_out):
    """Restart gating (the threefry + refresh block runs only every
    ``restart_every``-th leaf) is pure scheduling: the momentum draw is
    keyed on (chain, step), so a delayed restart makes the SAME draw.
    Outputs must be bitwise identical, alone and combined with packing."""
    (out1, C, S) = fused_out
    target = make_gaussian_target_dc(DIM, VAR)
    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, DIM))
    common = dict(
        target=target, num_steps=S, max_num_doublings=6, seed=3,
        num_track=DIM, tile_chains=128, chunk=32, interpret=True,
    )
    gated = fused_nuts_run_dc(
        x0, jnp.ones(DIM), 0.4, budget=2 * S * 64, restart_every=4, **common
    )
    for a, b, name in zip(out1, gated, ["final_x", "hist", "grads", "steps"]):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )
    packed_gated = fused_nuts_run_dc(
        x0, jnp.ones(DIM), 0.4, budget=4 * S * 64, pack=4, restart_every=8,
        **common,
    )
    for a, b, name in zip(
        out1, packed_gated, ["final_x", "hist", "grads", "steps"]
    ):
        np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b), err_msg=name
        )


def test_fused_nuts_dc_track_rows_selects_columns(fused_out):
    # tracking an arbitrary static coordinate subset must reproduce exactly
    # the corresponding columns of the full-tracking run (same seed =>
    # identical counter streams => identical samples)
    (_, hist_full, _, _), C, S = fused_out
    rows = (2, 0, 3)
    target = make_gaussian_target_dc(DIM, VAR)
    x0 = 0.2 * jax.random.normal(jax.random.key(0), (C, DIM))
    _, hist_sub, _, _ = fused_nuts_run_dc(
        x0,
        jnp.ones(DIM),
        0.4,
        target=target,
        num_steps=S,
        max_num_doublings=6,
        seed=3,
        num_track=len(rows),
        track_rows=rows,
        tile_chains=128,
        budget=S * 64,
        chunk=32,
        interpret=True,
    )
    np.testing.assert_array_equal(
        np.asarray(hist_sub), np.asarray(hist_full)[:, :, list(rows)]
    )


def test_fused_nuts_dc_track_rows_validation():
    target = make_gaussian_target_dc(DIM, VAR)
    x0 = jnp.zeros((8, DIM))
    with pytest.raises(ValueError, match="track_rows"):
        fused_nuts_run_dc(
            x0, jnp.ones(DIM), 0.4, target=target, num_steps=4,
            num_track=2, track_rows=(0, 1, 2), interpret=True,
        )
    with pytest.raises(ValueError, match="track_rows"):
        fused_nuts_run_dc(
            x0, jnp.ones(DIM), 0.4, target=target, num_steps=4,
            num_track=1, track_rows=(DIM,), interpret=True,
        )
