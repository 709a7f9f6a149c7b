"""Per-recipe estimator pins: every entry of the metric-recipe REGISTRY is
driven through its MetricCore interface on a planted diagonal+rank-1
Gaussian and must recover the structure its estimator promises.

Coverage model: the reference's ``tests/adaptation/test_low_rank_recipes.py``
(2,074 LoC) pins each recipe's output; this file covers the same cases —
recovery of the planted covariance (or the recipe's own estimand for the
Fisher diagonal), orthonormal factors, principal-direction alignment — plus
a fixed-input golden pin for the nutpie Fisher low-rank pipeline.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.adaptation.metric_recipes import REGISTRY, lookup_recipe
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix

D = 12
N = 600
RANK_SCALE = 16.0  # planted spike eigenvalue (in the correlation metric)

_CORE_KWARGS = {
    "welford_diag": {},
    "welford_dense": {},
    "fisher_diag": {},
    "fisher_low_rank": {"buffer_size": N},
    "fisher_low_rank_accumulating": {"buffer_size": N},
    "sample_cov_low_rank": {"buffer_size": N},
    "draws_svd_low_rank": {"capacity": N},
}


def _planted(key):
    """Sigma = S (I + (lam-1) u u^T) S with diagonal scales S and unit u."""
    scales = jnp.exp(jnp.linspace(-0.8, 0.8, D))
    u = jnp.ones(D) / jnp.sqrt(D)
    core = jnp.eye(D) + (RANK_SCALE - 1.0) * jnp.outer(u, u)
    cov = scales[:, None] * core * scales[None, :]
    chol = jnp.linalg.cholesky(cov)
    z = jax.random.normal(key, (N, D))
    draws = z @ chol.T
    grads = -jnp.linalg.solve(cov, draws.T).T
    return cov, scales, u, draws, grads


def _dense_imm(imm):
    if isinstance(imm, LowRankInverseMassMatrix):
        sigma = np.asarray(imm.sigma)
        U = np.asarray(imm.U)
        lam = np.asarray(imm.lam)
        core = np.eye(sigma.shape[0]) + U @ np.diag(lam - 1.0) @ U.T
        return sigma[:, None] * core * sigma[None, :]
    imm = np.asarray(imm)
    return np.diag(imm) if imm.ndim == 1 else imm


def _drive(name, draws, grads):
    recipe = lookup_recipe(name)
    core = recipe.build_core(**_CORE_KWARGS[name])
    needs_grads = "gradients" in recipe.needs

    @jax.jit
    def run(draws, grads):
        def step(state, xs):
            x, g = xs
            return core.update(state, x, g if needs_grads else None), None

        state, _ = jax.lax.scan(step, core.init(D), (draws, grads))
        return core.final(state)

    return run(draws, grads)


def _spectral_rel_error(got, want):
    # copies: numpy's eigensolvers reject the read-only zero-copy views
    # np.asarray returns for jax arrays
    ev_g = np.linalg.eigvalsh(np.array(got))
    ev_w = np.linalg.eigvalsh(np.array(want))
    return np.max(np.abs(ev_g - ev_w) / np.abs(ev_w))


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_recipe_structural_contract(rng_key, name):
    """Every recipe's final metric is finite and positive(-definite); low-
    rank factors are orthonormal with positive eigenvalue scales."""
    cov, scales, u, draws, grads = _planted(rng_key)
    state = _drive(name, draws, grads)
    imm = state.inverse_mass_matrix
    dense = _dense_imm(imm)
    assert np.isfinite(dense).all()
    assert np.linalg.eigvalsh(np.array(dense)).min() > 0
    if isinstance(imm, LowRankInverseMassMatrix):
        U = np.asarray(imm.U)
        active = np.linalg.norm(U, axis=0) > 1e-8
        Ua = U[:, active]
        np.testing.assert_allclose(
            Ua.T @ Ua, np.eye(Ua.shape[1]), atol=1e-5
        )
        assert np.asarray(imm.lam).min() > 0


def test_dense_covariance_recipe_recovers_planted_spectrum(rng_key):
    """The dense Welford recipe estimates Sigma itself: full spectral
    recovery plus principal-direction alignment with the planted spike.

    Threshold justified by a 100-seed sweep (tools/seed_sweep.py protocol):
    max-over-eigenvalues relative error has p50=0.12, observed max=0.17, so
    0.30 carries ~2x margin over the worst observed seed.
    """
    cov, scales, u, draws, grads = _planted(rng_key)
    state = _drive("welford_dense", draws, grads)
    dense = _dense_imm(state.inverse_mass_matrix)
    assert _spectral_rel_error(dense, np.asarray(cov)) < 0.30
    _assert_spike_aligned(dense, scales, u)


@pytest.mark.parametrize(
    "name", ["sample_cov_low_rank", "draws_svd_low_rank"]
)
def test_low_rank_covariance_recipes_recover_spike_and_bulk(rng_key, name):
    """Rank-truncating covariance recipes promise the spike (top eigenvalue
    + direction) and the typical bulk scale — NOT every bulk eigenvalue:
    the boundary eigenvalue between the retained subspace and the truncated
    bulk is inherently noisy (a 100-seed sweep shows the max-over-eigenvalues
    relative error is dominated by that boundary index, p50=0.39, max=0.76,
    while the top eigenvalue sits at p50=0.043, max=0.18 and the median at
    p50=0.086, max=0.14). Pin each statistic against its own sweep:
    top<0.30, median<0.25, and a coarse 0.95 cap on the worst eigenvalue."""
    cov, scales, u, draws, grads = _planted(rng_key)
    state = _drive(name, draws, grads)
    dense = _dense_imm(state.inverse_mass_matrix)
    ev_got = np.linalg.eigvalsh(np.array(dense))
    ev_want = np.linalg.eigvalsh(np.array(np.asarray(cov)))
    rel = np.abs(ev_got - ev_want) / np.abs(ev_want)
    assert rel[-1] < 0.30  # spike eigenvalue
    assert np.median(rel) < 0.25  # typical bulk scale
    assert rel.max() < 0.95  # boundary-eigenvalue sanity cap
    _assert_spike_aligned(dense, scales, u)


@pytest.mark.parametrize(
    "name", ["fisher_low_rank", "fisher_low_rank_accumulating"]
)
def test_fisher_recipes_recover_spike_and_scale(rng_key, name):
    """The Fisher-divergence metric targets the slow subspace, not the
    marginal variances: its diagonal is the fourth-root interpolation
    (Var[x]/Var[grad])^(1/4), so the bulk deliberately deviates from
    diag(Sigma). Pin what the estimator promises: the spike direction, the
    top eigenvalue, and a factor-2 band on the bulk."""
    cov, scales, u, draws, grads = _planted(rng_key)
    state = _drive(name, draws, grads)
    dense = _dense_imm(state.inverse_mass_matrix)
    _assert_spike_aligned(dense, scales, u)
    ev_got = np.linalg.eigvalsh(np.array(dense))
    ev_want = np.linalg.eigvalsh(np.array(cov))
    np.testing.assert_allclose(ev_got[-1], ev_want[-1], rtol=0.3)
    ratio = ev_got / ev_want
    assert np.all((ratio > 0.5) & (ratio < 2.0)), ratio


def _assert_spike_aligned(dense, scales, u):
    # principal direction of M^-1 vs the planted spike direction (S u)
    spike = np.array(scales * u)
    spike /= np.linalg.norm(spike)
    top = np.linalg.eigh(np.array(dense))[1][:, -1]
    assert abs(float(top @ spike)) > 0.9


def test_welford_diag_recovers_marginal_variances(rng_key):
    cov, *_ , draws, grads = _planted(rng_key)
    state = _drive("welford_diag", draws, grads)
    imm = np.asarray(state.inverse_mass_matrix)
    assert imm.shape == (D,)
    np.testing.assert_allclose(imm, np.diag(np.asarray(cov)), rtol=0.3)


def test_fisher_diag_matches_its_estimand(rng_key):
    """The Fisher diagonal's estimand is sqrt(Var[x]/Var[grad]) — pin the
    wiring against the empirical value from the same stream."""
    cov, _, _, draws, grads = _planted(rng_key)
    state = _drive("fisher_diag", draws, grads)
    imm = np.asarray(state.inverse_mass_matrix)
    dr, gr = np.asarray(draws), np.asarray(grads)
    expected = np.sqrt(dr.var(0) / gr.var(0))
    np.testing.assert_allclose(imm, expected, rtol=0.15)


@pytest.mark.x64only  # golden values generated under x64; f32 SVD drifts
def test_fisher_low_rank_golden_pin():
    """Fixed-input regression pin for the nutpie Algorithm-1 pipeline: any
    numeric change to the estimator shows up here before it shows up as a
    silent quality drift in warmup."""
    from blackjax_tpu.adaptation.metric_estimators import fisher_score_low_rank

    key = jax.random.key(1234)
    cov, scales, u, draws, grads = _planted(key)
    payload = fisher_score_low_rank(draws[:64], grads[:64], max_rank=4)
    got = np.concatenate(
        [
            np.asarray(payload.sigma)[:4],
            np.sort(np.asarray(payload.lam)),
            [float(np.abs(np.asarray(payload.U[:, 0])).sum())],
        ]
    )
    golden = np.asarray(_GOLDEN_FISHER_LRD)
    np.testing.assert_allclose(got, golden, rtol=1e-6)


# generated once from the implementation at round 3 (seed 1234, N=64, D=12,
# max_rank=4) via generate_golden(); regenerate ONLY for an intentional
# estimator change, and say why in the commit
_GOLDEN_FISHER_LRD = [
    0.5926102283370566,
    0.6343970178030403,
    0.6861611945352217,
    0.8773335603206133,
    1.0,
    1.0,
    1.0,
    9.275188765265039,
    3.455578647276273,
]


def generate_golden():  # pragma: no cover — maintenance helper
    from blackjax_tpu.adaptation.metric_estimators import fisher_score_low_rank

    key = jax.random.key(1234)
    cov, scales, u, draws, grads = _planted(key)
    payload = fisher_score_low_rank(draws[:64], grads[:64], max_rank=4)
    return np.concatenate(
        [
            np.asarray(payload.sigma)[:4],
            np.sort(np.asarray(payload.lam)),
            [float(np.abs(np.asarray(payload.U[:, 0])).sum())],
        ]
    ).tolist()


if __name__ == "__main__":  # pragma: no cover
    print(generate_golden())
