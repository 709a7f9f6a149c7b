"""Multichain pathfinder-adaptation breadth: validation, shape contracts,
IMM structure, degenerate path counts, pytree dispatch, and the bimodal
between-component payoff.

Scenario parity target: the reference's
``tests/adaptation/test_pathfinder_adaptation_multichain.py``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import nuts as nuts_mod

VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


# ---------------------------------------------------------------------------
# validation
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("num_chains", [0, -2])
def test_num_chains_nonpositive_raises(num_chains):
    with pytest.raises(ValueError, match="num_chains"):
        blackjax_tpu.pathfinder_adaptation(nuts_mod, logdensity, num_chains=num_chains)


@pytest.mark.parametrize("n_paths", [0, -1])
def test_n_paths_nonpositive_raises(n_paths):
    with pytest.raises(ValueError, match="n_paths"):
        blackjax_tpu.pathfinder_adaptation(nuts_mod, logdensity, n_paths=n_paths)


# ---------------------------------------------------------------------------
# shape contracts
# ---------------------------------------------------------------------------


def test_multichain_shapes_and_chain_axis(rng_key):
    num_chains = 3
    warmup = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, logdensity, num_chains=num_chains, num_samples_per_path=100
    )
    results, info = warmup.run(rng_key, jnp.full(4, 2.0), 80)
    assert results.parameters["step_size"].shape == (num_chains,)
    assert results.parameters["inverse_mass_matrix"].shape == (4, 4)
    assert results.state.position.shape == (num_chains, 4)


def test_multichain_default_n_paths_is_num_chains(rng_key):
    """n_paths=None defaults to num_chains (one path per chain): the run
    completes and the per-chain step sizes are finite and positive."""
    warmup = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, logdensity, num_chains=4, num_samples_per_path=100
    )
    results, _ = warmup.run(rng_key, jnp.full(4, 2.0), 80)
    ss = np.asarray(results.parameters["step_size"])
    assert ss.shape == (4,)
    assert (ss > 0).all() and np.isfinite(ss).all()


def test_imm_is_symmetric_psd(rng_key):
    warmup = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, logdensity, num_chains=4, n_paths=4, num_samples_per_path=150
    )
    results, _ = warmup.run(rng_key, jnp.full(4, 2.0), 80)
    imm = np.asarray(results.parameters["inverse_mass_matrix"])
    np.testing.assert_allclose(imm, imm.T, rtol=1e-8 if jax.config.jax_enable_x64 else 1e-4, atol=1e-6)
    evals = np.linalg.eigvalsh(imm)
    assert (evals > 0).all()


def test_pytree_position_multichain(rng_key):
    def tree_logdensity(p):
        return -0.5 * (jnp.sum(p["a"] ** 2) + p["b"] ** 2 / 4.0)

    warmup = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, tree_logdensity, num_chains=3, num_samples_per_path=100
    )
    init = {"a": jnp.ones(2), "b": jnp.zeros(())}
    results, _ = warmup.run(rng_key, init, 60)
    assert results.parameters["inverse_mass_matrix"].shape == (3, 3)
    assert results.state.position["a"].shape == (3, 2)
    assert results.state.position["b"].shape == (3,)


# ---------------------------------------------------------------------------
# estimation quality
# ---------------------------------------------------------------------------


def test_single_and_multipath_imm_both_recover_covariance(rng_key):
    """Both the single-path inverse Hessian and the PSIS mixture covariance
    approximate the diagonal target covariance."""
    single = blackjax_tpu.pathfinder_adaptation(nuts_mod, logdensity)
    r1, _ = single.run(rng_key, jnp.full(4, 2.0), 150)
    multi = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, logdensity, num_chains=4, n_paths=4, num_samples_per_path=200
    )
    r4, _ = multi.run(rng_key, jnp.full(4, 2.0), 150)
    for r in (r1, r4):
        imm = np.asarray(r.parameters["inverse_mass_matrix"])
        np.testing.assert_allclose(np.diag(imm), np.asarray(VARIANCES), rtol=0.6)


def test_bimodal_between_component_spread(rng_key):
    """On a well-separated bimodal target, the multi-path PSIS mixture
    covariance must include the BETWEEN-component spread along the mode
    axis — a single path sees only one mode's width."""
    sep = 6.0

    def bimodal(x):
        a = -0.5 * jnp.sum((x - jnp.array([sep, 0.0])) ** 2)
        b = -0.5 * jnp.sum((x + jnp.array([sep, 0.0])) ** 2)
        return jnp.logaddexp(a, b)

    # 16 paths: the chance every path lands in the same mode (which would
    # hide the between-component spread) is ~2^-15 — seed-rotation safe
    multi = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, bimodal, num_chains=8, n_paths=16, num_samples_per_path=200
    )
    results, _ = multi.run(rng_key, jnp.zeros(2), 50)
    imm = np.asarray(results.parameters["inverse_mass_matrix"])
    # paths land in both modes: variance along axis 0 is dominated by the
    # mode separation (~ sep^2), axis 1 stays ~1
    assert imm[0, 0] > 5.0, imm
    assert imm[1, 1] < 3.0, imm
