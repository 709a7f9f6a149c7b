"""Per-recipe FULL-WARMUP e2e grid: every REGISTRY metric recipe drives the
staged engine on posteriors chosen to exercise its estimand, and the
ADAPTED METRIC's operational quality is asserted — the preconditioned
condition number it leaves behind, not just structural finiteness.

Reference depth analogue: ``tests/adaptation/test_low_rank_recipes.py``
(per-recipe window-adaptation e2e, condition-number reductions) and
``tests/adaptation/test_meta_builders_e2e.py`` — this grid covers OUR
recipe registry (``blackjax_tpu/adaptation/metric_recipes.py:REGISTRY``)
one recipe at a time through the real warmup loop.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.metric_recipes import REGISTRY
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix

ALL_RECIPES = sorted(REGISTRY)


def _dense_imm(imm):
    """Any adapted inverse-mass-matrix — diag vector, dense matrix, or the
    low-rank namedtuple D(I + U(Lam-1)U^T)D — as a dense np array."""
    if isinstance(imm, LowRankInverseMassMatrix):
        sigma = np.asarray(imm.sigma)
        U = np.asarray(imm.U)
        lam = np.asarray(imm.lam)
        core = np.eye(len(sigma)) + U @ np.diag(lam - 1.0) @ U.T
        return np.diag(sigma) @ core @ np.diag(sigma)
    imm = np.asarray(imm)
    return np.diag(imm) if imm.ndim == 1 else imm


def _precond_condition(imm, precision):
    """Condition number of M^{-1/2}-preconditioned precision: 1.0 means the
    metric whitens the target exactly (ideal IMM = covariance)."""
    A = _dense_imm(imm)
    w, V = np.linalg.eigh(A)
    sqrtA = V @ np.diag(np.sqrt(np.maximum(w, 1e-12))) @ V.T
    evals = np.linalg.eigvalsh(sqrtA @ precision @ sqrtA)
    return float(evals[-1] / max(evals[0], 1e-12))


def _anisotropic_gaussian(d=8):
    scales = np.geomspace(0.3, 6.0, d)
    precision = np.diag(1.0 / scales**2)

    def logdensity(x):
        return -0.5 * jnp.sum((x / jnp.asarray(scales)) ** 2)

    return logdensity, precision, scales


def _spiked_gaussian(d=16, rank=2, seed=5):
    """Correlated Gaussian with `rank` planted covariance spikes: the
    workload the low-rank estimators exist for (diagonal preconditioning
    cannot whiten it)."""
    rng = np.random.default_rng(seed)
    Q, _ = np.linalg.qr(rng.standard_normal((d, rank)))
    cov = np.eye(d) + Q @ np.diag([24.0, 11.0][:rank]) @ Q.T
    precision = np.linalg.inv(cov)
    P = jnp.asarray(precision)

    def logdensity(x):
        return -0.5 * x @ P @ x

    return logdensity, precision, cov


def _default_options(recipe):
    """The buffer-backed cores have no default capacity (the window length
    is the caller's choice; reference parity — build_core raises without
    it, ``test_low_rank_cores.py::test_build_core_requires_buffer_size``).
    Probe by construction: the registry builders are ``**kw`` lambdas
    (the window cores take ``buffer_size``; the persistent raw-draw ring
    takes ``capacity``)."""
    for options in ({}, {"buffer_size": 256}, {"capacity": 256}):
        try:
            REGISTRY[recipe].build_core(**options)
            return options
        except TypeError:
            continue
    raise AssertionError(f"no known capacity option for recipe {recipe!r}")


def _run_warmup(rng_key, recipe, logdensity, d, num_steps=500):
    warmup = staged_adaptation(
        blackjax_tpu.nuts,
        logdensity,
        metric=recipe,
        metric_options=_default_options(recipe),
        max_num_doublings=6,
    )
    (state, params), _ = warmup.run(rng_key, jnp.ones(d), num_steps=num_steps)
    return state, params


@pytest.mark.parametrize("recipe", ALL_RECIPES)
def test_warmup_completes_with_sane_parameters(recipe, rng_key):
    """Every registry recipe survives a full staged warmup: finite adapted
    state, usable step size, finite metric of the declared emission kind."""
    logdensity, precision, _ = _anisotropic_gaussian(d=6)
    state, params = _run_warmup(rng_key, recipe, logdensity, 6, num_steps=400)
    eps = float(params["step_size"])
    assert 1e-3 < eps < 20.0
    dense = _dense_imm(params["inverse_mass_matrix"])
    assert dense.shape == (6, 6)
    assert np.all(np.isfinite(dense))
    # the adapted metric is SPD (usable as an HMC mass matrix)
    assert np.linalg.eigvalsh(dense)[0] > 0.0
    assert np.all(np.isfinite(np.asarray(jax.tree.leaves(state.position)[0])))
    emits = REGISTRY[recipe].emits
    imm = params["inverse_mass_matrix"]
    if emits == "low_rank":
        assert isinstance(imm, LowRankInverseMassMatrix)
    elif emits == "dense":
        assert np.asarray(imm).ndim == 2
    else:
        assert np.asarray(imm).ndim == 1


@pytest.mark.parametrize(
    "recipe",
    [r for r in ALL_RECIPES if REGISTRY[r].emits == "diag"],
)
def test_diag_recipes_whiten_anisotropic_gaussian(recipe, rng_key):
    """Diagonal recipes must essentially whiten an axis-aligned target:
    raw condition number (0.3 .. 6)^2 = 400 drops below 6 after warmup."""
    logdensity, precision, scales = _anisotropic_gaussian(d=8)
    _, params = _run_warmup(rng_key, recipe, logdensity, 8, num_steps=600)
    raw = _precond_condition(np.ones(8), precision)
    adapted = _precond_condition(params["inverse_mass_matrix"], precision)
    assert adapted < raw / 20.0, (recipe, adapted, raw)
    assert adapted < 6.0, (recipe, adapted)


@pytest.mark.parametrize(
    "recipe",
    [r for r in ALL_RECIPES if REGISTRY[r].emits in ("low_rank", "dense")],
)
def test_rich_recipes_whiten_planted_spikes(recipe, rng_key):
    """Low-rank/dense recipes must capture planted covariance spikes that
    NO diagonal metric can precondition away (the spiked directions are
    incoherent with the axes): condition 25 -> below 8."""
    logdensity, precision, cov = _spiked_gaussian(d=16, rank=2)
    _, params = _run_warmup(rng_key, recipe, logdensity, 16, num_steps=700)
    raw = _precond_condition(np.ones(16), precision)
    adapted = _precond_condition(params["inverse_mass_matrix"], precision)
    assert raw > 20.0  # the workload is genuinely ill-conditioned
    assert adapted < raw / 2.5, (recipe, adapted, raw)


@pytest.mark.parametrize(
    "recipe", ["welford_diag", "fisher_low_rank", "draws_svd_low_rank"]
)
def test_post_warmup_sampling_recovers_moments(recipe, rng_key):
    """Warmup -> adapted-metric NUTS sampling recovers the target's
    marginal variances (the user-visible contract of the whole recipe
    stack, one representative per emission family)."""
    logdensity, precision, cov = _spiked_gaussian(d=8, rank=1, seed=9)
    warm_key, sample_key = jax.random.split(rng_key)
    state, params = _run_warmup(warm_key, recipe, logdensity, 8, num_steps=600)
    algo = blackjax_tpu.nuts(logdensity, **params)
    n_chains = 8
    keys = jax.random.split(sample_key, (400, n_chains))
    states = jax.vmap(algo.init)(
        jnp.broadcast_to(state.position, (n_chains, 8))
        + 0.1 * jax.random.normal(jax.random.fold_in(sample_key, 1), (n_chains, 8))
    )

    @jax.jit
    def run(states, keys):
        def one(states, ks):
            states, _ = jax.vmap(algo.step)(ks, states)
            return states, states.position

        return jax.lax.scan(one, states, keys)

    _, hist = run(states, keys)  # (steps, chains, d)
    draws = np.asarray(hist[100:]).reshape(-1, 8)
    sample_var = draws.var(axis=0)
    true_var = np.diag(np.linalg.inv(precision))
    np.testing.assert_allclose(sample_var, true_var, rtol=0.45)


@pytest.mark.parametrize("recipe", ["fisher_low_rank", "sample_cov_low_rank"])
def test_low_rank_recipes_expose_buffer_options(recipe, rng_key):
    """metric_options flow through to the core builder: an oversized
    max_rank is structurally honored (U gets that many columns)."""
    logdensity, precision, _ = _anisotropic_gaussian(d=6)
    warmup = staged_adaptation(
        blackjax_tpu.nuts,
        logdensity,
        metric=recipe,
        metric_options={"buffer_size": 64, "max_rank": 5},
        max_num_doublings=6,
    )
    (_, params), _ = warmup.run(rng_key, jnp.ones(6), num_steps=300)
    imm = params["inverse_mass_matrix"]
    assert isinstance(imm, LowRankInverseMassMatrix)
    assert imm.U.shape == (6, 5)
