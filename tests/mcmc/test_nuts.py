"""NUTS engine validation.

- the checkpointing U-turn scheme is validated against a brute-force check
  over every power-of-two-aligned subtree;
- the flattened lockstep engine must produce bit-identical trajectories to
  the nested reference-structured engine for the same key (they share the
  key-derivation structure by construction);
- moment recovery on an anisotropic Gaussian.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import metrics, nuts, termination
from blackjax_tpu.mcmc.hmc import HMCState


class _FakeChainState:
    def __init__(self, position):
        self.position = position


def _brute_force_turning(momenta, is_turning):
    """For leaves 0..n-1, report whether ANY power-of-2-aligned subtree
    ending at the last leaf is turning."""
    n = len(momenta)
    b = n - 1
    size = 2
    while size <= n:
        if (b + 1) % size == 0:
            a = b - size + 1
            rho = sum(momenta[a : b + 1])
            if bool(is_turning(momenta[a], momenta[b], rho)):
                return True
        size *= 2
    return False


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_checkpoint_uturn_matches_brute_force(seed):
    d, max_depth = 3, 4
    rng = np.random.default_rng(seed)
    momenta = [jnp.asarray(rng.normal(size=d)) for _ in range(2**max_depth)]
    metric = metrics.gaussian_euclidean(jnp.ones(d))

    new_state, update, is_met = termination.iterative_uturn(metric.check_turning)
    state = new_state(_FakeChainState(jnp.zeros(d)), max_depth)

    momentum_sum = jnp.zeros(d)
    for leaf, m in enumerate(momenta):
        momentum_sum = momentum_sum + m
        state = update(state, momentum_sum, m, leaf)
        got = bool(is_met(state, momentum_sum, m))
        if leaf % 2 == 1:
            expected = _brute_force_turning(momenta[: leaf + 1], metric.check_turning)
            assert got == expected, f"leaf {leaf}: got {got}, expected {expected}"
        else:
            assert not got


def _logdensity(x):
    return -0.5 * jnp.sum(x**2 / jnp.array([1.0, 4.0, 0.25, 2.0]))


def test_flattened_matches_nested_engine(rng_key):
    imm = jnp.ones(4)
    # batched_uturn=False: the batched slot check is algebraically identical
    # but sums in a different order, so bit-exactness holds only for the
    # sequential path (the batched one is covered by
    # test_batched_uturn_statistically_identical)
    flat = jax.jit(
        nuts.build_kernel(engine="flattened", batched_uturn=False),
        static_argnums=(2,),
    )
    nested = jax.jit(nuts.build_kernel(engine="nested"), static_argnums=(2,))

    position = jnp.array([1.0, -0.5, 0.3, 0.8])
    state = nuts.init(position, _logdensity)

    s_flat, s_nested = state, state
    for i in range(25):
        key = jax.random.fold_in(rng_key, i)
        s_flat, info_flat = flat(key, s_flat, _logdensity, 0.25, imm)
        s_nested, info_nested = nested(key, s_nested, _logdensity, 0.25, imm)
        np.testing.assert_allclose(
            np.asarray(s_flat.position), np.asarray(s_nested.position), rtol=1e-10
        )
        assert int(info_flat.num_integration_steps) == int(
            info_nested.num_integration_steps
        )
        assert bool(info_flat.is_turning) == bool(info_nested.is_turning)
        np.testing.assert_allclose(
            float(info_flat.acceptance_rate),
            float(info_nested.acceptance_rate),
            rtol=1e-10,
        )


def test_nuts_moment_recovery(rng_key):
    variances = jnp.array([1.0, 4.0, 0.25, 2.0])
    algo = blackjax_tpu.nuts(_logdensity, step_size=0.5, inverse_mass_matrix=jnp.ones(4))
    state = algo.init(jnp.zeros(4))
    num_steps = 2000

    _, (states, infos) = blackjax_tpu.util.run_inference_algorithm(
        rng_key, algo, num_steps, initial_state=state
    )
    samples = np.asarray(states.position[500:])
    np.testing.assert_allclose(samples.mean(0), np.zeros(4), atol=0.25)
    np.testing.assert_allclose(samples.var(0), np.asarray(variances), rtol=0.3)
    assert np.asarray(infos.acceptance_rate).mean() > 0.5


def test_nuts_vmapped_chains(rng_key):
    """The flattened engine under vmap: many chains in lockstep."""
    num_chains = 32
    algo = blackjax_tpu.nuts(_logdensity, step_size=0.4, inverse_mass_matrix=jnp.ones(4))
    init_keys = jax.random.split(rng_key, num_chains)
    positions = jax.vmap(lambda k: jax.random.normal(k, (4,)))(init_keys)
    states = jax.vmap(algo.init)(positions)

    @jax.jit
    def step_all(key, states):
        keys = jax.random.split(key, num_chains)
        return jax.vmap(algo.step)(keys, states)

    all_pos = []
    key = rng_key
    states_c = states
    for i in range(200):
        key, sub = jax.random.split(key)
        states_c, infos = step_all(sub, states_c)
        all_pos.append(states_c.position)
    samples = np.asarray(jnp.stack(all_pos))[50:].reshape(-1, 4)
    np.testing.assert_allclose(samples.mean(0), np.zeros(4), atol=0.2)
    np.testing.assert_allclose(
        samples.var(0), np.array([1.0, 4.0, 0.25, 2.0]), rtol=0.25
    )


def test_batched_uturn_statistically_identical(rng_key):
    """The batched slot check must agree with the sequential loop: the
    per-slot decisions are algebraically equal, so trajectories only diverge
    at exact <=0 ties (measure zero). Compare full runs step by step."""
    imm = jnp.array([1.0, 2.0, 0.5, 1.5])
    batched = jax.jit(
        nuts.build_kernel(engine="flattened", batched_uturn=True),
        static_argnums=(2,),
    )
    looped = jax.jit(
        nuts.build_kernel(engine="flattened", batched_uturn=False),
        static_argnums=(2,),
    )
    state = nuts.init(jnp.array([1.0, -0.5, 0.3, 0.8]), _logdensity)
    s_b, s_l = state, state
    for i in range(25):
        key = jax.random.fold_in(rng_key, i)
        s_b, info_b = batched(key, s_b, _logdensity, 0.25, imm)
        s_l, info_l = looped(key, s_l, _logdensity, 0.25, imm)
        np.testing.assert_allclose(
            np.asarray(s_b.position), np.asarray(s_l.position), rtol=1e-5
        )
        assert int(info_b.num_integration_steps) == int(info_l.num_integration_steps)
        assert bool(info_b.is_turning) == bool(info_l.is_turning)


def test_batched_uturn_unit_agreement(rng_key):
    """Direct unit check: batched criterion == looped criterion over random
    checkpoint configurations, for diagonal, dense and low-rank metrics."""
    from blackjax_tpu.mcmc import metrics as metrics_mod

    d, k = 6, 4
    key_iter = jax.random.split(rng_key, 40)
    specs = {
        "diag": jnp.array([1.0, 0.5, 2.0, 1.5, 0.8, 1.2]),
        "dense": None,  # built below
        "low_rank": None,
    }
    A = jax.random.normal(jax.random.key(9), (d, d))
    specs["dense"] = A @ A.T / d + jnp.eye(d)
    Q, _ = jnp.linalg.qr(jax.random.normal(jax.random.key(10), (d, 2)))
    specs["low_rank"] = metrics_mod.LowRankInverseMassMatrix(
        sigma=jnp.full(d, 1.3), U=Q, lam=jnp.array([4.0, 0.3])
    )

    for name, spec in specs.items():
        metric = metrics_mod.default_metric(spec)
        assert metric.check_turning_batched is not None, name
        for key in key_iter:
            kr, ks, km, kS, ka = jax.random.split(key, 5)
            R = jax.random.normal(kr, (k, d))
            Ssum = jax.random.normal(ks, (k, d))
            m = jax.random.normal(km, (d,))
            S = jax.random.normal(kS, (d,))
            active = jax.random.bernoulli(ka, 0.7, (k,))

            got = bool(metric.check_turning_batched(R, Ssum, m, S, active))
            want = False
            for i in range(k):
                subtree_sum = S - Ssum[i] + R[i]
                want = want or (
                    bool(active[i])
                    and bool(metric.check_turning(R[i], m, subtree_sum))
                )
            assert got == want, f"{name}: batched={got} loop={want}"


def test_fused_many_steps_bit_identical_to_scan(rng_key):
    """The continuous runner must reproduce the scan-of-kernel samples
    EXACTLY (same per-(step, chain) keys, same transition machine)."""
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    num_chains, num_steps, dim = 6, 12, 4
    step_size, imm = 0.25, jnp.ones(4)

    algo = blackjax_tpu.nuts(_logdensity, step_size=step_size, inverse_mass_matrix=imm)
    init_keys = jax.random.split(rng_key, num_chains)
    positions = jax.vmap(lambda k: jax.random.normal(k, (dim,)))(init_keys)
    states = jax.vmap(algo.init)(positions)

    # scan-of-kernel reference path
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 1), num_steps)

    def one(states_c, k):
        ks = jax.random.split(k, num_chains)
        states_c, infos = jax.vmap(algo.step)(ks, states_c)
        return states_c, (states_c.position, infos.num_integration_steps)

    final_scan, (hist_scan, nsteps_scan) = jax.lax.scan(one, states, step_keys)

    # fused continuous path with the SAME per-(step, chain) keys
    rng_keys = jax.vmap(lambda k: jax.random.split(k, num_chains))(step_keys)
    run = build_fused_many_steps(
        _logdensity, step_size, imm, num_steps=num_steps
    )
    final_fused, hist_fused, grads = jax.jit(run)(rng_keys, states)

    # hist_scan: (S, C, d); hist_fused: (C, S, d)
    np.testing.assert_array_equal(
        np.asarray(hist_fused), np.asarray(hist_scan).swapaxes(0, 1)
    )
    assert int(grads) == int(jnp.sum(nsteps_scan))
    np.testing.assert_array_equal(
        np.asarray(final_fused.position), np.asarray(final_scan.position)
    )


@pytest.mark.parametrize("m", [2, 3, 6])
def test_fused_many_steps_oversubscribed_bit_identical(rng_key, m):
    """Slot oversubscription repacks chains onto C/m physical slots; the
    samples, finals, and grad counts must be bit-identical to m=1 (each
    chain consumes the same keys and machine steps regardless of packing)."""
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    num_chains, num_steps, dim = 6, 12, 4
    step_size, imm = 0.25, jnp.ones(4)
    algo = blackjax_tpu.nuts(_logdensity, step_size=step_size, inverse_mass_matrix=imm)
    init_keys = jax.random.split(rng_key, num_chains)
    positions = jax.vmap(lambda k: jax.random.normal(k, (dim,)))(init_keys)
    states = jax.vmap(algo.init)(positions)
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 1), num_steps)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, num_chains))(step_keys)

    base = jax.jit(
        build_fused_many_steps(_logdensity, step_size, imm, num_steps=num_steps)
    )
    f1, h1, g1 = base(rng_keys, states)
    over = jax.jit(
        build_fused_many_steps(
            _logdensity, step_size, imm, num_steps=num_steps, oversubscription=m
        )
    )
    fm, hm, gm = over(rng_keys, states)

    np.testing.assert_array_equal(np.asarray(h1), np.asarray(hm))
    assert int(g1) == int(gm)
    for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(fm)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("m,unroll,restart_every", [(1, 4, 1), (3, 2, 1), (1, 4, 4), (3, 4, 2)])
def test_fused_many_steps_unrolled_bit_identical(rng_key, m, unroll, restart_every):
    """while-loop unrolling (multiple machine leaves per iteration, with
    masked no-op overshoot at the end) must not change samples, finals, or
    grad counts — on both the plain and oversubscribed runners.

    Under x64 the comparison is exact; under the f32 pass the compiler may
    fma-contract across the composed bodies, so a tight allclose replaces
    bitwise equality (measured ULP-level deltas only)."""
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    num_chains, num_steps, dim = 6, 12, 4
    step_size, imm = 0.25, jnp.ones(4)
    algo = blackjax_tpu.nuts(_logdensity, step_size=step_size, inverse_mass_matrix=imm)
    init_keys = jax.random.split(rng_key, num_chains)
    positions = jax.vmap(lambda k: jax.random.normal(k, (dim,)))(init_keys)
    states = jax.vmap(algo.init)(positions)
    step_keys = jax.random.split(jax.random.fold_in(rng_key, 1), num_steps)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, num_chains))(step_keys)

    base = jax.jit(
        build_fused_many_steps(
            _logdensity, step_size, imm, num_steps=num_steps, oversubscription=m
        )
    )
    f1, h1, g1 = base(rng_keys, states)
    unrolled = jax.jit(
        build_fused_many_steps(
            _logdensity,
            step_size,
            imm,
            num_steps=num_steps,
            oversubscription=m,
            unroll=unroll,
            restart_every=restart_every,
        )
    )
    fu_, hu, gu = unrolled(rng_keys, states)

    if jax.config.jax_enable_x64:
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(hu))
        for a, b in zip(jax.tree.leaves(f1), jax.tree.leaves(fu_)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    else:
        np.testing.assert_allclose(
            np.asarray(h1), np.asarray(hu), rtol=1e-4, atol=1e-4
        )
    assert int(g1) == int(gu)


def test_fused_many_steps_tiny_window_still_exact(rng_key):
    """window_size smaller than the step count forces constant parking —
    results must STILL be bit-identical to the scan path."""
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    num_chains, num_steps, dim = 6, 12, 4
    step_size, imm = 0.25, jnp.ones(4)
    algo = blackjax_tpu.nuts(_logdensity, step_size=step_size, inverse_mass_matrix=imm)
    init_keys = jax.random.split(rng_key, num_chains)
    positions = jax.vmap(lambda k: jax.random.normal(k, (dim,)))(init_keys)
    states = jax.vmap(algo.init)(positions)

    step_keys = jax.random.split(jax.random.fold_in(rng_key, 1), num_steps)

    def one(states_c, k):
        ks = jax.random.split(k, num_chains)
        states_c, infos = jax.vmap(algo.step)(ks, states_c)
        return states_c, states_c.position

    final_scan, hist_scan = jax.lax.scan(one, states, step_keys)

    rng_keys = jax.vmap(lambda k: jax.random.split(k, num_chains))(step_keys)
    run = build_fused_many_steps(
        _logdensity, step_size, imm, num_steps=num_steps, window_size=2
    )
    final_fused, hist_fused, _ = jax.jit(run)(rng_keys, states)
    np.testing.assert_array_equal(
        np.asarray(hist_fused), np.asarray(hist_scan).swapaxes(0, 1)
    )
    np.testing.assert_array_equal(
        np.asarray(final_fused.position), np.asarray(final_scan.position)
    )
