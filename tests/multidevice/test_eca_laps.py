"""Multi-device tests on the 8-virtual-CPU-device mesh: ECA machinery,
sharded splitR, ensemble init, and LAPS end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec

import blackjax_tpu
from blackjax_tpu.adaptation.laps import laps
from blackjax_tpu.parallel import eca

NUM_DEVICES = 8


@pytest.fixture
def mesh():
    devices = jax.devices()
    if len(devices) < NUM_DEVICES:
        pytest.skip("needs 8 virtual devices")
    return Mesh(devices[:NUM_DEVICES], ("chains",))


def test_ensemble_execute_fn(mesh, rng_key):
    num_chains = 32

    def sequential_fn(key, x, args):
        draw = jax.random.normal(key)
        return draw, None

    out, expectation = eca.ensemble_execute_fn(
        sequential_fn,
        rng_key,
        num_chains,
        mesh,
        summary_statistics_fn=lambda y: {"mean": y, "sq": y**2},
    )
    assert out.shape == (num_chains,)
    # psum-averaged expectation must equal the plain average of the outputs
    np.testing.assert_allclose(float(expectation["mean"]), np.mean(np.asarray(out)), rtol=1e-6)


def test_run_eca_with_early_stop(mesh, rng_key):
    num_chains, dim = 32, 4
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    kernel_impl = blackjax_tpu.mala.build_kernel()

    def kernel(key, state, adaptation_state):
        return kernel_impl(key, state, logdensity, 0.5)

    def summary_statistics_fn(state, info, key):
        return {"acc": info.acceptance_rate, "sq": jnp.sum(state.position**2)}

    def adaptation_update(adaptation_state, E):
        return adaptation_state + 1, {"acc": E["acc"], "sq": E["sq"]}

    from types import SimpleNamespace

    adap = SimpleNamespace(
        initial_state=jnp.asarray(0),
        summary_statistics_fn=summary_statistics_fn,
        update=adaptation_update,
        while_cond=lambda info, counter: info["acc"] > -1.0,  # never stops early
    )

    positions = jax.device_put(
        jax.random.normal(rng_key, (num_chains, dim)),
        NamedSharding(mesh, PartitionSpec("chains")),
    )
    states = jax.jit(
        jax.vmap(lambda p: blackjax_tpu.mala.init(p, logdensity)),
        out_shardings=NamedSharding(mesh, PartitionSpec("chains")),
    )(positions)

    final_state, final_adaptation, info = eca.run_eca(
        rng_key, states, kernel, adap, 10, num_chains, mesh,
        superchain_size=4, early_stop=True,
    )
    assert final_state.position.shape == (num_chains, dim)
    assert int(final_adaptation) == 10
    assert "R_avg" in info and info["acc"].shape == (10,)


def test_sharded_splitR_matches_unsharded(mesh, rng_key):
    from blackjax_tpu.diagnostics import splitR
    num_chains, dim, superchain = 32, 3, 4
    positions = jax.random.normal(rng_key, (num_chains, dim)) * jnp.array([1.0, 2.0, 3.0])
    expected = np.asarray(splitR(positions, num_chains, superchain))

    p = PartitionSpec("chains")
    sharded = jax.device_put(positions, NamedSharding(mesh, p))

    def f(block):
        return eca.sharded_splitR(block, num_chains, superchain)

    got = jax.shard_map(f, mesh=mesh, in_specs=(p,), out_specs=PartitionSpec())(sharded)
    np.testing.assert_allclose(np.asarray(got), expected, rtol=1e-5)


def test_laps_end_to_end(mesh, rng_key):
    num_chains, dim = 64, 4
    variances = jnp.array([1.0, 4.0, 0.25, 2.0])
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / variances)
    sample_init = lambda key: 2.0 * jax.random.normal(key, (dim,))

    info, grad_calls, acc_prob, final_state = laps(
        logdensity,
        sample_init,
        dim,
        num_steps1=100,
        num_steps2=600,
        num_chains=num_chains,
        mesh=mesh,
        rng_key=rng_key,
        early_stop=False,
        superchain_size=1,
    )
    assert np.isfinite(np.asarray(final_state.position)).all()
    # the ensemble at the end of phase 2 should roughly match target moments
    final_positions = np.asarray(final_state.position)
    np.testing.assert_allclose(final_positions.mean(0), np.zeros(dim), atol=0.8)
    # acceptance in phase 2 should be reasonable
    acc = np.asarray(info["phase_2"]["acc_prob"])
    assert acc[-1] > 0.4


def test_fused_nuts_runner_sharded(mesh, rng_key):
    """The continuous NUTS runner under shard_map: each device's while loop
    finishes its own chains independently (no cross-device sync needed —
    chains are independent), and results are bit-identical to one device."""
    from jax.sharding import PartitionSpec as P

    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    C, S, D = 32, 10, 4
    ld = lambda x: -0.5 * jnp.sum(x**2 / jnp.array([1.0, 4.0, 0.25, 2.0]))
    algo = blackjax_tpu.nuts(ld, step_size=0.25, inverse_mass_matrix=jnp.ones(D))
    states = jax.vmap(algo.init)(jax.random.normal(rng_key, (C, D)))
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 1), S)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, C))(step_keys)

    run = build_fused_many_steps(ld, 0.25, jnp.ones(D), num_steps=S)
    final_ref, hist_ref, grads_ref = jax.jit(run)(rng_keys, states)

    def run_wrapped(rng_keys, states):
        final, hist, grads = run(rng_keys, states)
        return final, hist, jax.lax.psum(grads, "chains")

    sharded = jax.shard_map(
        run_wrapped,
        mesh=mesh,
        in_specs=(P(None, "chains"), P("chains")),
        out_specs=(P("chains"), P("chains"), P()),
    )
    final_sh, hist_sh, grads_sh = jax.jit(sharded)(rng_keys, states)
    np.testing.assert_array_equal(np.asarray(hist_sh), np.asarray(hist_ref))
    np.testing.assert_array_equal(
        np.asarray(final_sh.position), np.asarray(final_ref.position)
    )
    assert int(grads_sh) == int(grads_ref)


def test_fused_nuts_runner_oversubscribed_sharded(mesh, rng_key):
    """Slot oversubscription composes with shard_map: slots repack each
    device's LOCAL chain block (chain c = s + j*P per shard), still
    bit-identical to the unsharded m=1 run."""
    from jax.sharding import PartitionSpec as P

    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    C, S, D = 32, 10, 4
    ld = lambda x: -0.5 * jnp.sum(x**2 / jnp.array([1.0, 4.0, 0.25, 2.0]))
    algo = blackjax_tpu.nuts(ld, step_size=0.25, inverse_mass_matrix=jnp.ones(D))
    states = jax.vmap(algo.init)(jax.random.normal(rng_key, (C, D)))
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 1), S)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, C))(step_keys)

    base = build_fused_many_steps(ld, 0.25, jnp.ones(D), num_steps=S)
    _, hist_ref, grads_ref = jax.jit(base)(rng_keys, states)

    over = build_fused_many_steps(
        ld, 0.25, jnp.ones(D), num_steps=S, oversubscription=2
    )

    def run_wrapped(rng_keys, states):
        final, hist, grads = over(rng_keys, states)
        return hist, jax.lax.psum(grads, "chains")

    hist_sh, grads_sh = jax.jit(
        jax.shard_map(
            run_wrapped,
            mesh=mesh,
            in_specs=(P(None, "chains"), P("chains")),
            out_specs=(P("chains"), P()),
        )
    )(rng_keys, states)
    np.testing.assert_array_equal(np.asarray(hist_sh), np.asarray(hist_ref))
    assert int(grads_sh) == int(grads_ref)


def test_while_with_info_early_exit(rng_key):
    """The scan-shaped early-stoppable loop must stop once the condition
    fails, record every executed step's info into the static buffer, and
    report the executed count."""
    from blackjax_tpu.parallel import eca

    def step(carry, x):
        new = carry + x
        return new, {"value": new}

    xs = jnp.ones(10)
    # run while value < 4: steps produce 1,2,3,4 -> the 4th step records 4
    # and flips the condition; steps 5..10 never run
    final, info, counter = jax.jit(
        lambda init, xs: eca.while_with_info(
            step, init, xs, 10, lambda info, i: info["value"] < 4.0
        )
    )(jnp.asarray(0.0), xs)
    assert int(counter) == 4
    assert float(final) == 4.0
    np.testing.assert_allclose(np.asarray(info["value"])[:4], [1.0, 2.0, 3.0, 4.0])
    # untouched buffer tail stays zero (preallocated)
    np.testing.assert_allclose(np.asarray(info["value"])[4:], 0.0)


def test_while_with_info_runs_to_length(rng_key):
    from blackjax_tpu.parallel import eca

    step = lambda c, x: (c + x, {"v": c})
    final, info, counter = eca.while_with_info(
        step, jnp.asarray(0.0), jnp.ones(5), 5, lambda info, i: jnp.asarray(True)
    )
    assert int(counter) == 5 and float(final) == 5.0


def test_oversubscribed_with_large_window_matches_m1(mesh, rng_key):
    """Regression: an explicit window_size larger than num_steps used to
    escape the finals write's width-2 slab in the oversubscribed runner,
    silently zeroing some chains' final states. The window must clamp to S."""
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    C, S, D = 16, 6, 4
    ld = lambda x: -0.5 * jnp.sum(x**2)
    algo = blackjax_tpu.nuts(ld, step_size=0.3, inverse_mass_matrix=jnp.ones(D))
    states = jax.vmap(algo.init)(jax.random.normal(rng_key, (C, D)))
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 3), S)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, C))(step_keys)

    base = build_fused_many_steps(ld, 0.3, jnp.ones(D), num_steps=S)
    final_ref, hist_ref, _ = jax.jit(base)(rng_keys, states)

    over = build_fused_many_steps(
        ld, 0.3, jnp.ones(D), num_steps=S, oversubscription=4, window_size=4 * S
    )
    final_ov, hist_ov, _ = jax.jit(over)(rng_keys, states)
    np.testing.assert_array_equal(np.asarray(hist_ov), np.asarray(hist_ref))
    np.testing.assert_array_equal(
        np.asarray(final_ov.position), np.asarray(final_ref.position)
    )
    assert np.any(np.asarray(final_ov.position) != 0.0)


@pytest.mark.parametrize("use_typed_key", [True, False], ids=["typed", "legacy"])
def test_laps_key_style(mesh, rng_key, use_typed_key):
    """LAPS/ECA must accept both typed keys and legacy uint32[2] PRNGKeys.

    Reference regression (``tests/mcmc/test_sampling.py:785``): a full
    ``keys.T`` reverses *all* axes, which corrupts legacy key arrays whose
    trailing axis is the raw key representation; the step axis must be
    brought forward with ``swapaxes(0, 1)`` (``parallel/eca.py:195``).
    """
    dim = 2
    logdensity = lambda x: -0.5 * jnp.sum(x**2)
    sample_init = lambda key: jax.random.normal(key, (dim,))

    if use_typed_key:
        run_key = rng_key
    else:
        # explicit uint32: under x64 `bits` defaults to uint64 and a
        # top-bit draw overflows PRNGKey's int64 seed (~50% of daily seeds)
        run_key = jax.random.PRNGKey(
            int(jax.random.bits(rng_key, dtype=jnp.uint32))
        )

    _, _, _, final_state = laps(
        logdensity,
        sample_init,
        dim,
        num_steps1=50,
        num_steps2=50,
        num_chains=16,
        mesh=mesh,
        rng_key=run_key,
        early_stop=False,
        steps_per_sample=5,
        r_end=0.5,
        diagnostics=False,
        superchain_size=1,
    )
    assert final_state.position.shape == (16, dim)
    assert np.isfinite(np.asarray(final_state.position)).all()
