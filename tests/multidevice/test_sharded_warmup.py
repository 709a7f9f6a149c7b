"""Mesh-sharded cross-chain warmups: ChEES, MEADS (diag + LRD), and the
multi-chain staged engine run inside ``shard_map`` over a chains mesh and
must match the single-device vmap path.

Exactness tiers: one controller update is bit-identical (pure psum-completed
reductions); full warmups couple the reduction rounding back into
accept/reject decisions, so they are compared statistically (matching
parameters within a few percent / recovering the known scales).

Parity targets: ``blackjax/adaptation/chees_adaptation.py:574``,
``meads_adaptation.py:316`` composed with the ECA psum pattern
(``eca.py:56-62``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from jax.sharding import Mesh, PartitionSpec

from blackjax_tpu.adaptation import chees_adaptation as chees_mod
from blackjax_tpu.adaptation.chees_adaptation import chees_adaptation
from blackjax_tpu.adaptation.meads_adaptation import (
    maximum_eigenvalue,
    meads_adaptation,
)
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
from blackjax_tpu.mcmc import hmc as hmc_mod
from blackjax_tpu.parallel.exchange import ring_gather

TRUE_VAR = jnp.array([1.0, 4.0, 0.25, 2.0])
LOGDENSITY = lambda x: -0.5 * jnp.sum(x**2 / TRUE_VAR)
P, REP = PartitionSpec("chains"), PartitionSpec()


def chains_mesh():
    return Mesh(np.array(jax.devices()[:8]), ("chains",))


def test_ring_gather_matches_global_indexing(rng_key):
    n, d = 64, 3
    x = {"a": (jnp.arange(n * d) * 1.0).reshape(n, d), "b": jnp.arange(n) * 1.0}
    idx = jax.random.permutation(rng_key, n)
    idx_blocks = idx.reshape(8, 8)

    out = jax.shard_map(
        lambda t, i: ring_gather(t, i, "chains"),
        mesh=chains_mesh(),
        in_specs=(jax.tree.map(lambda _: P, x), P),
        out_specs=jax.tree.map(lambda _: P, x),
        check_vma=False,
    )(x, idx)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.asarray(x["a"][idx]))
    np.testing.assert_array_equal(np.asarray(out["b"]), np.asarray(x["b"][idx]))


def test_maximum_eigenvalue_forms_agree(rng_key):
    """Gram form, covariance form, and the sharded covariance form evaluate
    the same estimator."""
    X = jax.random.normal(rng_key, (32, 5)) @ jnp.diag(jnp.array([3.0, 1.0, 1.0, 0.5, 0.1]))
    gram = maximum_eigenvalue(X)  # n > d picks the covariance form
    # force the gram form via a wide batch slice comparison instead: compute
    # both on the same data through the private switch
    n, d = X.shape
    g = X @ X.T
    diag = jnp.diagonal(g)
    first = jnp.sum(diag) / n
    second = (jnp.sum(g**2) - jnp.sum(diag**2)) / (n * (n - 1))
    tight = 1e-10 if jax.config.jax_enable_x64 else 1e-4
    np.testing.assert_allclose(float(gram), float(second / first), rtol=tight)

    sharded = jax.shard_map(
        lambda x: maximum_eigenvalue(x, "chains"),
        mesh=chains_mesh(),
        in_specs=(P,),
        out_specs=REP,
        check_vma=False,
    )(X)
    np.testing.assert_allclose(float(sharded), float(gram), rtol=tight)


def test_chees_update_matches_vmap(rng_key):
    """One sharded controller update == one vmap update, same inputs.

    Scalar outputs are compared at ULP-level tolerance, not bit equality:
    the psum reduces shard partial-sums in a different association order
    than the vmap path's flat sum, which is a legitimate 1-ulp difference
    (observed on rotating daily seeds)."""
    n, d = 32, 4
    ks = jax.random.split(rng_key, 5)
    prop_pos = jax.random.normal(ks[0], (n, d))
    prop_mom = jax.random.normal(ks[1], (n, d))
    init_pos = jax.random.normal(ks[2], (n, d))
    acc = jax.random.uniform(ks[3], (n,), minval=0.1, maxval=1.0)
    div = jax.random.bernoulli(ks[4], 0.1, (n,))
    imm = jnp.array([1.0, 2.0, 0.5, 1.5])
    optim = optax.adam(0.5)
    jitter, nxt = (lambda i: 0.7), (lambda i: i + 1)

    init_ref, upd_ref = chees_mod.base(jitter, nxt, optim, 0.651, 0.5, 1000)
    st = init_ref(0, 0.3)
    ref = upd_ref(st, prop_pos, prop_mom, init_pos, acc, div, imm)

    _, upd_s = chees_mod.base(jitter, nxt, optim, 0.651, 0.5, 1000, axis_name="chains")
    out = jax.shard_map(
        lambda *a: upd_s(st, *a),
        mesh=chains_mesh(),
        in_specs=(P, P, P, P, P, REP),
        out_specs=REP,
        check_vma=False,
    )(prop_pos, prop_mom, init_pos, acc, div, imm)

    ulp = 5e-15 if jax.config.jax_enable_x64 else 3e-6
    np.testing.assert_allclose(
        float(out.step_size), float(ref.step_size), rtol=ulp
    )
    np.testing.assert_allclose(
        float(out.trajectory_length), float(ref.trajectory_length), rtol=ulp
    )
    np.testing.assert_allclose(
        float(out.log_trajectory_length_moving_average),
        float(ref.log_trajectory_length_moving_average),
        rtol=ulp,
    )


def test_chees_sharded_run_matches_vmap_mid_horizon(rng_key):
    """Tight mid-horizon equivalence: at 20 steps the sharded run has not
    yet accumulated meaningful association-order drift through adam, so the
    adapted parameters must agree to ~1e-3 — a regression gate the loose
    statistical 400-step check (rtol 0.25) cannot provide."""
    num_chains, steps = 64, 20
    positions = jax.random.normal(jax.random.key(1), (num_chains, 4)) * jnp.sqrt(
        TRUE_VAR
    )
    optim = optax.adam(0.25)

    ref = chees_adaptation(LOGDENSITY, num_chains, mass_matrix_estimation="diagonal")
    res_ref, _ = ref.run(rng_key, positions, 0.5, optim, steps)

    algo = chees_adaptation(
        LOGDENSITY, num_chains, mass_matrix_estimation="diagonal", axis_name="chains"
    )

    def run(key, pos):
        res, _ = algo.run(key, pos, 0.5, optim, steps)
        return (
            res.parameters["step_size"],
            res.parameters["integration_steps_params"][0],
        )

    ss, isp = jax.shard_map(
        run,
        mesh=chains_mesh(),
        in_specs=(REP, P),
        out_specs=(REP, REP),
        check_vma=False,
    )(rng_key, positions)

    tol = 1e-3 if jax.config.jax_enable_x64 else 5e-3
    ref_p = res_ref.parameters
    np.testing.assert_allclose(float(ss), float(ref_p["step_size"]), rtol=tol)
    np.testing.assert_allclose(
        float(isp), float(ref_p["integration_steps_params"][0]), rtol=tol
    )


@pytest.mark.slow
def test_chees_sharded_run_matches_vmap_statistically(rng_key):
    num_chains, steps = 64, 400
    positions = jax.random.normal(jax.random.key(1), (num_chains, 4)) * jnp.sqrt(TRUE_VAR)
    optim = optax.adam(0.25)

    ref = chees_adaptation(LOGDENSITY, num_chains, mass_matrix_estimation="diagonal")
    res_ref, _ = ref.run(rng_key, positions, 0.5, optim, steps)

    algo = chees_adaptation(
        LOGDENSITY, num_chains, mass_matrix_estimation="diagonal", axis_name="chains"
    )

    def run(key, pos):
        res, _ = algo.run(key, pos, 0.5, optim, steps)
        return (
            res.parameters["step_size"],
            res.parameters["inverse_mass_matrix"],
            res.parameters["integration_steps_params"][0],
        )

    ss, imm, isp = jax.shard_map(
        run, mesh=chains_mesh(), in_specs=(REP, P), out_specs=(REP, REP, REP),
        check_vma=False,
    )(rng_key, positions)

    ref_p = res_ref.parameters
    # f32: adam compounds ULP-level psum-order deltas over 400 steps, so
    # the end-to-end band is wider (the one-update test is ULP-exact)
    np.testing.assert_allclose(
        float(ss), float(ref_p["step_size"]), rtol=0.25 if jax.config.jax_enable_x64 else 0.5
    )
    np.testing.assert_allclose(
        float(isp), float(ref_p["integration_steps_params"][0]),
        rtol=0.35 if jax.config.jax_enable_x64 else 0.75,
    )
    # both paths must recover the target variances
    np.testing.assert_allclose(np.asarray(imm), np.asarray(TRUE_VAR), rtol=0.25)


@pytest.mark.slow
@pytest.mark.parametrize("low_rank", [None, 2])
def test_meads_sharded_run_matches_vmap(rng_key, low_rank):
    num_chains, steps = 32, 100
    positions = jax.random.normal(jax.random.key(1), (num_chains, 4)) * jnp.sqrt(TRUE_VAR)

    ref = meads_adaptation(LOGDENSITY, num_chains, num_folds=4, low_rank_rank=low_rank)
    res_ref, _ = ref.run(rng_key, positions, steps)

    algo = meads_adaptation(
        LOGDENSITY, num_chains, num_folds=4, low_rank_rank=low_rank,
        axis_name="chains",
    )

    def run(key, pos):
        res, _ = algo.run(key, pos, steps)
        pr = res.parameters
        scale = pr["momentum_inverse_scale"]
        sigma = scale.sigma if low_rank else scale
        return pr["step_size"], pr["alpha"], pr["delta"], sigma, res.state.position

    ss, al, de, sigma, pos = jax.shard_map(
        run, mesh=chains_mesh(), in_specs=(REP, P), out_specs=(REP, REP, REP, REP, P),
        check_vma=False,
    )(rng_key, positions)

    pr = res_ref.parameters
    ref_scale = pr["momentum_inverse_scale"]
    ref_sigma = ref_scale.sigma if low_rank else ref_scale
    # GHMC's slice accept keeps the runs numerically close for this length
    np.testing.assert_allclose(float(ss), float(pr["step_size"]), rtol=0.05)
    np.testing.assert_allclose(float(al), float(pr["alpha"]), rtol=0.05)
    np.testing.assert_allclose(np.asarray(sigma), np.asarray(ref_sigma), rtol=0.1)
    assert np.all(np.isfinite(np.asarray(pos)))


@pytest.mark.slow
def test_staged_multichain_sharded_matches_vmap(rng_key):
    num_chains, steps = 32, 300
    positions = jax.random.normal(jax.random.key(1), (num_chains, 4)) * jnp.sqrt(TRUE_VAR)

    ref = staged_adaptation(
        hmc_mod, LOGDENSITY, n_chains=num_chains, num_integration_steps=8
    )
    res_ref, _ = ref.run(rng_key, positions, steps)

    algo = staged_adaptation(
        hmc_mod, LOGDENSITY, n_chains=num_chains, num_integration_steps=8,
        axis_name="chains",
    )

    def run(key, pos):
        res, _ = algo.run(key, pos, steps)
        return res.parameters["step_size"], res.parameters["inverse_mass_matrix"]

    ss, imm = jax.shard_map(
        run, mesh=chains_mesh(), in_specs=(REP, P), out_specs=(REP, REP),
        check_vma=False,
    )(rng_key, positions)

    ref_p = res_ref.parameters
    # f32: adam compounds ULP-level psum-order deltas over 400 steps, so
    # the end-to-end band is wider (the one-update test is ULP-exact)
    np.testing.assert_allclose(
        float(ss), float(ref_p["step_size"]), rtol=0.25 if jax.config.jax_enable_x64 else 0.5
    )
    np.testing.assert_allclose(
        np.asarray(imm), np.asarray(ref_p["inverse_mass_matrix"]), rtol=0.25
    )
    np.testing.assert_allclose(np.asarray(imm), np.asarray(TRUE_VAR), rtol=0.35)
