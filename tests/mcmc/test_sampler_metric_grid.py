"""Sampler x rich-metric moment grid: NUTS, static HMC and dynamic HMC
each sample a correlated Gaussian under a dense AND a low-rank inverse
mass matrix and must recover first and second moments.

Completes the reference scenario class ``tests/mcmc/test_sampling.py:
1291-1316`` (dense / low-rank metric moment recovery) across the
HMC-family kernels — the GHMC twin lives in ``test_ghmc_rich_metrics.py``;
this grid covers the trajectory-building kernels whose U-turn checks and
momentum sampling go through the same :mod:`blackjax_tpu.mcmc.metrics`
dispatch but different integration machinery (static trip counts, NUTS
checkpoint slots, drawn-length masked loops).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.mcmc import metrics
from blackjax_tpu.util import run_inference_algorithm

LOC = jnp.array([0.8, -1.5, 0.3, 2.0])
_SCALE = jnp.array([1.0, 2.5, 0.5, 1.5])
_CORR = jnp.array(
    [
        [1.0, 0.55, -0.25, 0.1],
        [0.55, 1.0, 0.3, -0.2],
        [-0.25, 0.3, 1.0, 0.4],
        [0.1, -0.2, 0.4, 1.0],
    ]
)
COV = _CORR * _SCALE[:, None] * _SCALE[None, :]
_PREC = jnp.linalg.inv(COV)
D = 4


def logdensity(x):
    delta = x - LOC
    return -0.5 * delta @ _PREC @ delta


def _low_rank_imm(rank=2):
    """The low-rank approximation of COV in the metric's own
    parameterization D(I + U(lam-1)U^T)D: diagonal scales plus the `rank`
    strongest correlation eigendirections."""
    sigma = jnp.sqrt(jnp.diagonal(COV))
    corr = COV / jnp.outer(sigma, sigma)
    eigenvalues, eigenvectors = jnp.linalg.eigh(corr)
    top = jnp.argsort(jnp.abs(eigenvalues - 1.0))[::-1][:rank]
    return metrics.LowRankInverseMassMatrix(
        sigma=sigma, U=eigenvectors[:, top], lam=eigenvalues[top]
    )


METRICS = {
    "dense": lambda: COV,
    "low_rank": _low_rank_imm,
}

SAMPLERS = {
    "nuts": lambda imm: blackjax_tpu.nuts(
        logdensity, step_size=0.5, inverse_mass_matrix=imm
    ),
    # static HMC phase hazard: under a whitening metric EVERY mode rotates
    # by theta = L*eps per trajectory; L*eps near pi makes the update
    # x' ~= -x + O(sin theta) p — positions flip sign but |x| barely
    # mixes, so variances equilibrate arbitrarily slowly (measured: 8 x
    # 0.4 = 3.2 ~= pi biases Var by 50%+ at 6k steps). Keep theta well
    # off multiples of pi: 5 x 0.35 = 1.75.
    "hmc": lambda imm: blackjax_tpu.hmc(
        logdensity,
        step_size=0.35,
        inverse_mass_matrix=imm,
        num_integration_steps=5,
    ),
    "dynamic_hmc": lambda imm: blackjax_tpu.dynamic_hmc(
        logdensity, step_size=0.4, inverse_mass_matrix=imm
    ),
}


def _sample(algorithm, rng_key, num_steps=6000, burnin=1500):
    init_key, sample_key = jax.random.split(rng_key)
    state = algorithm.init(LOC, init_key) if _init_takes_key(algorithm) else algorithm.init(LOC)
    _, positions = run_inference_algorithm(
        rng_key=sample_key,
        initial_state=state,
        inference_algorithm=algorithm,
        transform=lambda state, info: state.position,
        num_steps=num_steps,
    )
    return positions[burnin:]


def _init_takes_key(algorithm):
    import inspect

    try:
        return len(inspect.signature(algorithm.init).parameters) >= 2
    except (TypeError, ValueError):  # pragma: no cover
        return False


@pytest.mark.parametrize("metric_name", sorted(METRICS))
@pytest.mark.parametrize("sampler_name", sorted(SAMPLERS))
def test_sampler_recovers_moments_under_rich_metric(
    sampler_name, metric_name, rng_key
):
    imm = METRICS[metric_name]()
    algorithm = SAMPLERS[sampler_name](imm)
    samples = _sample(algorithm, rng_key)
    np.testing.assert_allclose(jnp.mean(samples, axis=0), LOC, atol=0.4)
    np.testing.assert_allclose(jnp.cov(samples.T), COV, atol=0.9)


@pytest.mark.parametrize("sampler_name", sorted(SAMPLERS))
def test_full_rank_low_rank_metric_matches_dense_moments(sampler_name, rng_key):
    """rank = d: the low-rank parameterization IS the dense metric; the
    kernels must deliver statistically indistinguishable moments through
    the O(dk) matvec path and the O(d^2) dense path."""
    key_a, key_b = jax.random.split(rng_key)
    dense_samples = _sample(SAMPLERS[sampler_name](COV), key_a, num_steps=4000)
    lr_samples = _sample(
        SAMPLERS[sampler_name](_low_rank_imm(rank=D)), key_b, num_steps=4000
    )
    np.testing.assert_allclose(
        jnp.mean(dense_samples, axis=0), jnp.mean(lr_samples, axis=0), atol=0.45
    )
    np.testing.assert_allclose(
        jnp.var(dense_samples, axis=0), jnp.var(lr_samples, axis=0), rtol=0.5
    )
