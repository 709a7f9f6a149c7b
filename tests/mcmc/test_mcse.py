"""Monte-Carlo-standard-error exactness tier: the strictest statistical gate.

For each sampler family, run many chains on a correlated 2-D Gaussian with
known moments and require the posterior mean / variance / correlation
estimates to sit within ``z_(1-p)`` Monte-Carlo standard errors of the truth
(CLT scaling by the measured effective sample size). This catches subtle
bias (a wrong acceptance ratio, a mis-signed weight) that loose absolute
tolerances never would.

Behavioral parity target: the reference's ``MonteCarloStandardErrorTest``
(``tests/mcmc/test_sampling.py:1378``), re-derived on our runner and
diagnostics stack.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import stats

import blackjax_tpu
from blackjax_tpu.diagnostics import effective_sample_size
from blackjax_tpu.util import run_inference_algorithm

LOC = jnp.array([0.7, 3.0])
SCALE = jnp.array([1.0, 2.0])
RHO = 0.75
COV = jnp.array(
    [
        [SCALE[0] ** 2, RHO * SCALE[0] * SCALE[1]],
        [RHO * SCALE[0] * SCALE[1], SCALE[1] ** 2],
    ]
)
PREC = jnp.linalg.inv(COV)


def logdensity_fn(x):
    delta = x - LOC
    return -0.5 * delta @ PREC @ delta


def mcse_assert(samples, true_value, p_val=5e-4):
    """CLT gate: |mean - truth| must be under z_(1-p) measured MC standard
    errors, where MCSE = (mean per-chain sd) / sqrt(ESS).

    ``p_val`` is family-wise adjusted: the suite makes ~42 comparisons
    (7 samplers x 3 statistics x <=2 dims), so per-comparison p=0.01 would
    false-alarm ~1 run in 3 under the null; 5e-4 keeps the family-wise rate
    ~2% while ESS ~ 25k still pins any real bias above ~1.5% to z >> 3.3."""
    samples = np.asarray(samples)  # (chains, steps, k)
    posterior_mean = samples.mean(axis=(0, 1))
    ess = np.asarray(
        effective_sample_size(samples, chain_axis=0, sample_axis=1)
    )
    posterior_sd = samples.std(axis=1, ddof=1).mean(axis=0)
    mcse = posterior_sd / np.sqrt(ess)
    scaled_error = np.abs(posterior_mean - np.asarray(true_value)) / mcse
    np.testing.assert_array_less(scaled_error, stats.norm.ppf(1 - p_val))


CASES = [
    pytest.param(
        lambda: blackjax_tpu.hmc(
            logdensity_fn,
            step_size=0.5,
            inverse_mass_matrix=SCALE**2,
            num_integration_steps=20,
        ),
        id="hmc-diag",
    ),
    pytest.param(
        lambda: blackjax_tpu.hmc(
            logdensity_fn,
            step_size=0.85,
            inverse_mass_matrix=COV,
            num_integration_steps=27,
        ),
        id="hmc-dense",
    ),
    pytest.param(
        lambda: blackjax_tpu.nuts(
            logdensity_fn, step_size=0.5, inverse_mass_matrix=SCALE**2
        ),
        id="nuts-diag",
    ),
    pytest.param(
        lambda: blackjax_tpu.nuts(
            logdensity_fn, step_size=0.85, inverse_mass_matrix=COV
        ),
        id="nuts-dense",
    ),
    pytest.param(
        lambda: blackjax_tpu.barker_proposal(logdensity_fn, step_size=0.45),
        id="barker",
    ),
    pytest.param(
        lambda: blackjax_tpu.mala(logdensity_fn, step_size=0.25),
        id="mala",
    ),
    pytest.param(
        lambda: blackjax_tpu.ghmc(
            logdensity_fn,
            step_size=0.4,
            momentum_inverse_scale=SCALE,
            alpha=0.8,
            delta=0.4,
        ),
        id="ghmc",
    ),
    pytest.param(
        lambda: blackjax_tpu.dynamic_hmc(
            logdensity_fn, step_size=0.4, inverse_mass_matrix=SCALE**2
        ),
        id="dynamic-hmc",
    ),
    pytest.param(
        lambda: blackjax_tpu.slice_sampling(logdensity_fn),
        id="slice",
    ),
]


@pytest.mark.slow
@pytest.mark.x64only  # the tier quantifies sub-percent bias; f32 rounding
# contributes its own pseudo-bias at that scale
@pytest.mark.parametrize("make_algorithm", CASES)
def test_mcse(make_algorithm):
    algorithm = make_algorithm()
    num_chains, num_steps, burn = 16, 3000, 1000
    key = jax.random.key(8456)
    pos_key, init_key, sample_key = jax.random.split(key, 3)

    positions = jax.random.normal(pos_key, (num_chains, 2))
    try:
        initial_states = jax.vmap(algorithm.init)(positions)
    except (TypeError, ValueError):  # init requiring an rng (e.g. ghmc)
        initial_states = jax.vmap(algorithm.init)(
            positions, jax.random.split(init_key, num_chains)
        )

    run = jax.vmap(
        functools.partial(
            run_inference_algorithm,
            inference_algorithm=algorithm,
            num_steps=num_steps,
            transform=lambda state, info: state.position,
        )
    )
    _, states = run(
        rng_key=jax.random.split(sample_key, num_chains),
        initial_state=initial_states,
    )

    samples = states[:, burn:]  # (chains, steps, 2)
    delta = samples - LOC
    variance = delta**2
    correlation = (delta[..., :1] * delta[..., 1:]) / (SCALE[0] * SCALE[1])

    mcse_assert(samples, LOC)
    mcse_assert(variance, SCALE**2)
    mcse_assert(correlation, jnp.array([RHO]))
