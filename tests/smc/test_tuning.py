"""Static inner-kernel tuning helpers: statistics from the particle cloud
(``smc.tuning.from_particles``), acceptance-rate scale control
(``smc.tuning.from_kernel_info``), and the pretuning domain constraints.

Scenario parity targets: ``tests/smc/test_inner_kernel_tuning.py``
(MeanAndStdFromParticles / InverseMassMatrixFromParticles /
ScaleCovarianceFromAcceptanceRates / ParticlesAsRows) and
``tests/smc/test_pretuning.py`` (natural-parameter clamping) in the
reference suite.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blackjax_tpu.smc.tuning.from_kernel_info import update_scale_from_acceptance_rate
from blackjax_tpu.smc.tuning.from_particles import (
    inverse_mass_matrix_from_particles,
    particles_as_rows,
    particles_covariance_matrix,
    particles_means,
    particles_stds,
)

# ---------------------------------------------------------------------------
# from_particles: cloud statistics across the three particle layouts
# (flat array, matrix, multi-variable pytree)
# ---------------------------------------------------------------------------


def test_cloud_stats_univariate(rng_key):
    particles = 10.0 + 0.5 * jax.random.normal(rng_key, (4000, 1))
    np.testing.assert_allclose(particles_means(particles), 10.0, rtol=1e-1)
    np.testing.assert_allclose(particles_stds(particles), 0.5, rtol=1e-1)
    np.testing.assert_allclose(
        particles_covariance_matrix(particles), 0.25, rtol=1.5e-1
    )


def test_cloud_stats_multivariate_correlated(rng_key):
    # one shared normal draw scaled per-coordinate -> perfectly correlated
    z = jax.random.normal(rng_key, (4000, 1))
    particles = jnp.array([10.0, 15.0]) + z * jnp.array([0.5, 0.7])
    np.testing.assert_allclose(
        particles_means(particles), np.array([10.0, 15.0]), rtol=1e-1
    )
    np.testing.assert_allclose(
        particles_stds(particles), np.array([0.5, 0.7]), rtol=1e-1
    )
    np.testing.assert_allclose(
        particles_covariance_matrix(particles),
        np.array([[0.25, 0.35], [0.35, 0.49]]),
        atol=1e-1,
    )


def test_cloud_stats_multivariable_pytree_exact():
    # two particles, two variables of different widths: statistics are the
    # raveled per-coordinate population values (ddof=0), computed exactly
    particles = {
        "a": jnp.array([[10.0, 15.0], [3.0, 4.0]]),
        "b": jnp.array([[10.0], [3.0]]),
    }
    np.testing.assert_allclose(particles_means(particles), [6.5, 9.5, 6.5])
    np.testing.assert_allclose(particles_stds(particles), [3.5, 5.5, 3.5])
    np.testing.assert_allclose(
        particles_covariance_matrix(particles),
        [[12.25, 19.25, 12.25], [19.25, 30.25, 19.25], [12.25, 19.25, 12.25]],
    )


def test_particles_as_rows_ravel_order():
    # each particle's leaves are raveled in pytree order into one row
    particles = {
        "a": jnp.arange(6.0).reshape(2, 3),
        "b": jnp.array([[9.0], [11.0]]),
    }
    rows = particles_as_rows(particles)
    np.testing.assert_allclose(rows, [[0.0, 1.0, 2.0, 9.0], [3.0, 4.0, 5.0, 11.0]])


@pytest.mark.parametrize(
    "particles, expected_diag",
    [
        # scalar particles -> 1x1 variance
        (np.array([10.0, 3.0]), [12.25]),
        # vector particles -> per-coordinate variances
        (np.array([[10.0, 15.0], [3.0, 4.0]]), [12.25, 30.25]),
    ],
)
def test_imm_from_particles_arrays(particles, expected_diag):
    imm = inverse_mass_matrix_from_particles(particles)
    d = len(expected_diag)
    assert imm.shape == (d, d)
    np.testing.assert_allclose(np.diag(imm), expected_diag, rtol=1e-6)
    # diagonal estimator: off-diagonals are exactly zero
    np.testing.assert_allclose(imm - np.diag(np.diag(imm)), np.zeros((d, d)))


def test_imm_from_multivariable_particles():
    particles = {
        "a": jnp.array([[10.0, 15.0], [3.0, 4.0]]),
        "b": jnp.array([[10.0], [3.0]]),
    }
    imm = inverse_mass_matrix_from_particles(particles)
    assert imm.shape == (3, 3)
    np.testing.assert_allclose(np.diag(imm), [12.25, 30.25, 12.25], rtol=1e-6)


def test_imm_from_multivariable_univariate_particles():
    particles = {"a": jnp.array([3.0, 2.0]), "b": jnp.array([10.0, 3.0])}
    imm = inverse_mass_matrix_from_particles(particles)
    assert imm.shape == (2, 2)
    np.testing.assert_allclose(np.diag(imm), [0.25, 12.25], rtol=1e-6)


# ---------------------------------------------------------------------------
# from_kernel_info: acceptance-rate-driven scale control
# ---------------------------------------------------------------------------


def test_scale_decreases_below_target():
    new = update_scale_from_acceptance_rate(
        scales=jnp.array([0.5]), acceptance_rates=jnp.array([0.2])
    )
    assert float(new[0]) < 0.5


def test_scale_increases_above_target():
    new = update_scale_from_acceptance_rate(
        scales=jnp.array([0.5]), acceptance_rates=jnp.array([0.3])
    )
    assert float(new[0]) > 0.5


def test_scale_fixed_point_at_target():
    # at exactly the target rate the multiplicative update is identity and
    # the population shrink is a no-op for a uniform population
    new = update_scale_from_acceptance_rate(
        scales=jnp.array([0.5, 0.5]), acceptance_rates=jnp.array([0.234, 0.234])
    )
    np.testing.assert_allclose(np.asarray(new), [0.5, 0.5], rtol=1e-6)


def test_scale_update_shrinks_toward_population_mean():
    # two chains with identical rates: the updated scales move halfway to
    # their common mean, so the spread strictly contracts
    scales = jnp.array([0.2, 0.8])
    rates = jnp.array([0.234, 0.234])
    new = np.asarray(update_scale_from_acceptance_rate(scales, rates))
    assert new[1] - new[0] < 0.6
    np.testing.assert_allclose(new.mean(), 0.5, rtol=1e-6)
    np.testing.assert_allclose(new, [0.35, 0.65], rtol=1e-6)


# ---------------------------------------------------------------------------
# pretuning domain constraints (build_pretune natural/positive rules)
# ---------------------------------------------------------------------------


def _run_constrained_pretune(rng_key, natural=(), positive=()):
    """One pretune call on a tiny RW population with the given constraint
    lists; returns the updated parameter dict."""
    import blackjax_tpu
    from blackjax_tpu.smc.inner_kernel_tuning import StateWithParameterOverride
    from blackjax_tpu.smc.pretuning import build_pretune

    n = 64
    logposterior = lambda x: -0.5 * jnp.sum(x**2)

    step_fn = blackjax_tpu.additive_step_random_walk.build_kernel()
    init_fn = blackjax_tpu.additive_step_random_walk.init

    def rw_step(key, state, logdensity_fn, sigma):
        return step_fn(
            key,
            state,
            logdensity_fn,
            lambda k, pos: sigma * jax.random.normal(k, jnp.shape(pos)),
        )

    pretune = build_pretune(
        init_fn,
        rw_step,
        alpha=1.0,
        sigma_parameters={"sigma": jnp.full((n,), 0.5)},
        n_particles=n,
        performance_of_chain_measure_factory=lambda state: jax.vmap(
            lambda prev, new, acc: acc * jnp.sum((prev - new) ** 2)
        ),
        natural_parameters=list(natural),
        positive_parameters=list(positive),
    )

    particles = jax.random.normal(rng_key, (n, 2))
    state = StateWithParameterOverride(
        blackjax_tpu.tempered_smc.init(particles),
        # start some entries negative so abs/round rules are observable
        {"sigma": jnp.linspace(-2.0, 2.0, n)},
    )
    return pretune(rng_key, state, logposterior)


def test_pretune_natural_parameters_clamped_to_one(rng_key):
    params = _run_constrained_pretune(rng_key, natural=("sigma",))
    vals = np.asarray(params["sigma"])
    assert vals.dtype.kind == "i"
    assert (vals >= 1).all()


def test_pretune_positive_parameters_are_absolute(rng_key):
    params = _run_constrained_pretune(rng_key, positive=("sigma",))
    assert (np.asarray(params["sigma"]) >= 0).all()


def test_pretune_unconstrained_keeps_sign(rng_key):
    params = _run_constrained_pretune(rng_key)
    # the random walk starts at linspace(-2, 2); with no constraint some
    # negative values survive the resample
    assert (np.asarray(params["sigma"]) < 0).any()
