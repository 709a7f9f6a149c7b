"""Per-recipe warmup end-to-end: every metric-recipe REGISTRY entry drives
a full staged NUTS warmup on a planted diagonal+spike Gaussian, and the
adapted (step size, metric) pair must actually SAMPLE well afterwards.

This is the reference's per-recipe integration tier
(``tests/adaptation/test_low_rank_recipes.py`` FisherLowRankStagedAdaptation
/ SampleCovLowRankStagedAdaptation classes) generalized to the whole
registry: beyond "finite outputs", each case pins the two quantities
adaptation exists to deliver — a step size whose acceptance lands near the
0.8 target, and a metric that improves the effective conditioning over
identity (for the recipes whose estimand can: the planted spike is exactly
low-rank structure).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.adaptation.metric_recipes import REGISTRY
from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
from blackjax_tpu.mcmc import nuts as nuts_mod
from blackjax_tpu.mcmc.metrics import LowRankInverseMassMatrix
from blackjax_tpu.util import run_inference_algorithm

D = 8
SPIKE = 25.0  # condition number of the planted target


def _target():
    """N(0, Sigma) with Sigma = I + (SPIKE-1) u u^T, u = ones/sqrt(D)."""
    u = np.ones(D) / np.sqrt(D)
    cov = np.eye(D) + (SPIKE - 1.0) * np.outer(u, u)
    prec = jnp.asarray(np.linalg.inv(cov), jnp.float32)

    def logdensity(x):
        return -0.5 * x @ (prec @ x)

    return logdensity, cov


_RECIPE_OPTIONS = {
    "welford_diag": {},
    "welford_dense": {},
    "fisher_diag": {},
    "fisher_low_rank": {"buffer_size": 200},
    "fisher_low_rank_accumulating": {"buffer_size": 200},
    "sample_cov_low_rank": {"buffer_size": 200},
    "draws_svd_low_rank": {"capacity": 200},
}

# recipes whose estimand captures the planted spike (full covariance or
# low-rank): the adapted metric must beat identity conditioning
_STRUCTURE_CAPTURING = {
    "welford_dense",
    "fisher_low_rank",
    "fisher_low_rank_accumulating",
    "sample_cov_low_rank",
    "draws_svd_low_rank",
}


def _effective_condition(imm, cov):
    """cond(M^{-1/2}-whitened Sigma) — 1.0 is perfect preconditioning."""
    if isinstance(imm, LowRankInverseMassMatrix):
        sigma = np.asarray(imm.sigma)
        U = np.asarray(imm.U)
        lam = np.asarray(imm.lam)
        dense = sigma[:, None] * (
            np.eye(D) + U @ np.diag(lam - 1.0) @ U.T
        ) * sigma[None, :]
    else:
        imm = np.asarray(imm)
        dense = np.diag(imm) if imm.ndim == 1 else imm
    # whitened target covariance: M^{-1/2} is any square root of dense
    w, V = np.linalg.eigh(dense)
    root = V @ np.diag(np.sqrt(np.maximum(w, 1e-12))) @ V.T
    whitened = root @ np.linalg.inv(cov) @ root  # precision-whitened
    ev = np.linalg.eigvalsh(whitened)
    return float(ev.max() / ev.min())


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_recipe_staged_warmup_end_to_end(name, rng_key):
    logdensity, cov = _target()
    warm_key, sample_key, pos_key = jax.random.split(rng_key, 3)

    warmup = staged_adaptation(
        nuts_mod,
        logdensity,
        metric=name,
        metric_options=_RECIPE_OPTIONS[name],
    )
    position = jax.random.normal(pos_key, (D,))
    results, _ = warmup.run(warm_key, position, 500)
    step_size = float(results.parameters["step_size"])
    imm = results.parameters["inverse_mass_matrix"]

    assert np.isfinite(step_size) and step_size > 0, (name, step_size)
    assert np.all(
        np.isfinite(np.asarray(jax.tree.leaves(imm)[0]))
    ), name

    # the adapted pair must sample at a healthy acceptance rate
    algo = blackjax_tpu.nuts(
        logdensity, step_size=step_size, inverse_mass_matrix=imm
    )
    _, (states, infos) = run_inference_algorithm(
        sample_key, algo, 300, initial_state=results.state
    )
    acc = float(np.mean(np.asarray(infos.acceptance_rate)))
    assert 0.55 < acc <= 1.0, (name, acc)

    cond = _effective_condition(imm, cov)
    if name in _STRUCTURE_CAPTURING:
        # identity metric leaves cond = SPIKE; capturing the spike must
        # at least halve it (it typically lands near 1-3)
        assert cond < SPIKE / 2, (name, cond)
    else:
        # diagonal recipes can't remove an off-axis spike, but must not
        # make things worse than identity by more than estimator noise
        assert cond < SPIKE * 2, (name, cond)


def test_auto_metric_controller_end_to_end(rng_key):
    """metric="auto" (the meta controller) completes on the same target and
    delivers a usable pair — the controller's own decision quality is
    pinned in tests/adaptation/test_meta*.py; here it must compose with
    the staged engine end-to-end."""
    logdensity, cov = _target()
    warm_key, sample_key, pos_key = jax.random.split(rng_key, 3)
    warmup = staged_adaptation(
        nuts_mod,
        logdensity,
        metric="auto",
        max_grad_budget=20_000,
    )
    results, _ = warmup.run(warm_key, jax.random.normal(pos_key, (D,)), 500)
    step_size = float(results.parameters["step_size"])
    assert np.isfinite(step_size) and step_size > 0
    algo = blackjax_tpu.nuts(
        logdensity,
        step_size=step_size,
        inverse_mass_matrix=results.parameters["inverse_mass_matrix"],
    )
    _, (states, infos) = run_inference_algorithm(
        sample_key, algo, 200, initial_state=results.state
    )
    assert 0.5 < float(np.mean(np.asarray(infos.acceptance_rate))) <= 1.0
