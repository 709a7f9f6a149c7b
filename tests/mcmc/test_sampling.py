"""Statistical integration tests: univariate/multivariate moment recovery
across the sampler families (mirrors the strategy of the reference's
``tests/mcmc/test_sampling.py:1055-1240``)."""
import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.util import run_inference_algorithm

TRUE_LOC, TRUE_SCALE = 1.0, 2.0


def normal_logdensity(x):
    return -0.5 * jnp.sum(((x - TRUE_LOC) / TRUE_SCALE) ** 2)


def _algorithms(rng_key):
    d = 4
    imm = jnp.ones(d) * TRUE_SCALE**2
    return {
        "hmc": (
            blackjax_tpu.hmc(
                normal_logdensity,
                step_size=0.5,
                inverse_mass_matrix=imm,
                num_integration_steps=8,
            ),
            2000,
        ),
        "mhmc": (
            blackjax_tpu.mhmc(
                normal_logdensity,
                step_size=0.5,
                inverse_mass_matrix=imm,
                num_integration_steps=8,
            ),
            2000,
        ),
        "nuts": (
            blackjax_tpu.nuts(
                normal_logdensity, step_size=0.7, inverse_mass_matrix=imm
            ),
            1500,
        ),
        "mala": (
            blackjax_tpu.mala(normal_logdensity, step_size=0.3),
            4000,
        ),
        "rw": (
            blackjax_tpu.additive_step_random_walk.normal_random_walk(
                normal_logdensity, jnp.full(4, 1.5)
            ),
            6000,
        ),
        "ghmc": (
            blackjax_tpu.ghmc(
                normal_logdensity,
                step_size=0.6,
                momentum_inverse_scale=jnp.full(4, 1.0 / TRUE_SCALE),
                alpha=0.2,
                delta=0.05,
            ),
            4000,
        ),
        "mclmc": (
            blackjax_tpu.mclmc(normal_logdensity, L=3.0, step_size=0.6),
            4000,
        ),
        "adjusted_mclmc": (
            blackjax_tpu.adjusted_mclmc(
                normal_logdensity, step_size=0.8, num_integration_steps=5
            ),
            3000,
        ),
        "dynamic_hmc": (
            blackjax_tpu.dynamic_hmc(
                normal_logdensity, step_size=0.5, inverse_mass_matrix=imm
            ),
            2500,
        ),
        "adjusted_mclmc_dynamic": (
            blackjax_tpu.adjusted_mclmc_dynamic(
                normal_logdensity, step_size=0.8
            ),
            3000,
        ),
        "barker": (
            blackjax_tpu.barker(normal_logdensity, step_size=1.0),
            4000,
        ),
        "rmh": (
            blackjax_tpu.rmh(
                normal_logdensity,
                proposal_generator=lambda key, pos: pos
                + 1.2 * jax.random.normal(key, (4,)),
            ),
            6000,
        ),
        "irmh": (
            blackjax_tpu.irmh(
                normal_logdensity,
                # over-dispersed independent proposal (scale 3 > true 2)
                proposal_distribution=lambda key: TRUE_LOC
                + 3.0 * jax.random.normal(key, (4,)),
            ),
            6000,
        ),
        "rmhmc": (
            blackjax_tpu.rmhmc(
                normal_logdensity,
                step_size=0.5,
                mass_matrix=lambda pos: jnp.eye(4) / TRUE_SCALE**2,
                num_integration_steps=8,
            ),
            2000,
        ),
        "slice": (
            blackjax_tpu.slice_sampling(normal_logdensity, width=2.0),
            4000,
        ),
        "coordinate_slice": (
            blackjax_tpu.coordinate_slice(normal_logdensity, initial_widths=2.0),
            2000,
        ),
    }


@pytest.mark.parametrize(
    "name",
    [
        "hmc",
        "mhmc",
        "nuts",
        "mala",
        "rw",
        "ghmc",
        "mclmc",
        "adjusted_mclmc",
        "dynamic_hmc",
        "adjusted_mclmc_dynamic",
        "barker",
        "rmh",
        "irmh",
        "rmhmc",
        "slice",
        "coordinate_slice",
    ],
)
def test_univariate_normal_moments(name, rng_key):
    algo, num_steps = _algorithms(rng_key)[name]
    init_key, run_key = jax.random.split(rng_key)
    position = TRUE_LOC + jnp.zeros(4)
    state = algo.init(position, init_key)
    _, (states, _) = run_inference_algorithm(
        run_key, algo, num_steps, initial_state=state
    )
    burn = num_steps // 4
    samples = np.asarray(states.position)[burn:].reshape(-1)
    assert abs(samples.mean() - TRUE_LOC) < 0.25, f"{name}: mean {samples.mean()}"
    assert abs(samples.std() - TRUE_SCALE) < 0.5, f"{name}: std {samples.std()}"


def test_elliptical_slice_univariate_moments(rng_key):
    """Elliptical slice with a flat likelihood samples the Gaussian prior
    exactly (the reference's univariate-normal case,
    ``tests/mcmc/test_sampling.py:1149-1160``)."""
    algo = blackjax_tpu.elliptical_slice(
        lambda x: jnp.zeros(()),
        mean=jnp.full(4, TRUE_LOC),
        cov=jnp.full(4, TRUE_SCALE**2),
    )
    state = algo.init(jnp.full(4, TRUE_LOC))
    _, (states, _) = run_inference_algorithm(
        rng_key, algo, 4000, initial_state=state
    )
    samples = np.asarray(states.position)[500:].reshape(-1)
    assert abs(samples.mean() - TRUE_LOC) < 0.25, samples.mean()
    assert abs(samples.std() - TRUE_SCALE) < 0.5, samples.std()


def test_orbital_hmc_univariate_moments(rng_key):
    """Periodic-orbital HMC: weighted orbit samples recover the moments
    (the reference's case, ``tests/mcmc/test_sampling.py:1190-1214``)."""
    algo = blackjax_tpu.orbital_hmc(
        normal_logdensity,
        step_size=0.4,
        inverse_mass_matrix=jnp.full(4, TRUE_SCALE**2),
        period=10,
    )
    state = algo.init(jnp.full(4, TRUE_LOC))
    _, (states, _) = run_inference_algorithm(
        rng_key, algo, 3000, initial_state=state
    )
    burn = 500
    positions = np.asarray(states.positions)[burn:]  # (n, period, d)
    weights = np.asarray(states.weights)[burn:]  # (n, period)
    w = weights / weights.sum()
    mean = (w[..., None] * positions).sum((0, 1)).mean()
    var = (w[..., None] * positions**2).sum((0, 1)).mean() - mean**2
    assert abs(mean - TRUE_LOC) < 0.25, mean
    assert abs(np.sqrt(var) - TRUE_SCALE) < 0.5, var


def test_irmh_exact_on_gaussian(rng_key):
    """IRMH with the exact target as proposal accepts everything."""
    proposal_dist = lambda key: TRUE_LOC + TRUE_SCALE * jax.random.normal(key, (4,))

    def proposal_logdensity(from_state, to_state):
        # independent proposal: q(to | from) = q(to)
        return normal_logdensity(to_state.position)

    algo = blackjax_tpu.irmh(normal_logdensity, proposal_dist, proposal_logdensity)
    state = algo.init(jnp.zeros(4))
    _, (states, infos) = run_inference_algorithm(rng_key, algo, 500, initial_state=state)
    assert np.asarray(infos.is_accepted).mean() > 0.99


def test_rmh_asymmetric_proposal_correction(rng_key):
    """A drifted proposal with the correct Hastings correction must still
    target the distribution exactly; the same proposal treated as symmetric
    must visibly bias the chain toward the drift — together they pin the
    `proposal_logdensity_fn` term's sign and usage."""
    drift, sig = 0.8, 1.0
    target = lambda x: -0.5 * jnp.sum(x**2)

    def proposal(key, x):
        return x + drift + sig * jax.random.normal(key, x.shape)

    def proposal_logdensity(new_state, prev_state):
        # convention (random_walk.py:_transition_energy): called as
        # (new, prev), returns the REVERSE proposal density log q(prev|new)
        diff = prev_state.position - new_state.position - drift
        return -0.5 * jnp.sum(diff**2) / sig**2

    def run(algo, key, n=8000):
        state = algo.init(jnp.zeros(1))
        step = jax.jit(algo.step)
        xs = []
        for i in range(n):
            state, _ = step(jax.random.fold_in(key, i), state)
            xs.append(float(state.position[0]))
        return np.asarray(xs)[1000:]

    corrected = blackjax_tpu.rmh(target, proposal, proposal_logdensity)
    xs = run(corrected, rng_key)
    assert abs(xs.mean()) < 0.12, xs.mean()
    assert abs(xs.std() - 1.0) < 0.1, xs.std()

    # null experiment: the uncorrected chain drifts right
    uncorrected = blackjax_tpu.rmh(target, proposal)
    ys = run(uncorrected, jax.random.fold_in(rng_key, 99), n=4000)
    assert ys.mean() > 0.2, ys.mean()
