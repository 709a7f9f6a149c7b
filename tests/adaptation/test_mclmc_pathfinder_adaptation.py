"""MCLMC tuning and pathfinder adaptation end-to-end."""
import jax
import jax.numpy as jnp
import numpy as np

import blackjax_tpu
from blackjax_tpu.mcmc import mclmc as mclmc_mod
from blackjax_tpu.mcmc import nuts as nuts_mod

VARIANCES = jnp.array([1.0, 4.0, 0.25, 2.0])


def logdensity(x):
    return -0.5 * jnp.sum(x**2 / VARIANCES)


def test_mclmc_find_L_and_step_size(rng_key):
    init_key, tune_key, run_key = jax.random.split(rng_key, 3)
    kernel = mclmc_mod.build_kernel()
    state = mclmc_mod.init(jnp.ones(4), logdensity, init_key)

    state, params, n_tuning = blackjax_tpu.mclmc_find_L_and_step_size(
        kernel, 2000, state, tune_key, logdensity_fn=logdensity
    )
    assert np.isfinite(float(params.L)) and float(params.L) > 0
    assert np.isfinite(float(params.step_size)) and float(params.step_size) > 0
    # preconditioner should reflect the target variances
    np.testing.assert_allclose(
        np.asarray(params.inverse_mass_matrix), np.asarray(VARIANCES), rtol=0.8
    )

    algo = blackjax_tpu.mclmc(
        logdensity,
        L=params.L,
        step_size=params.step_size,
        inverse_mass_matrix=params.inverse_mass_matrix,
    )
    _, (states, infos) = blackjax_tpu.util.run_inference_algorithm(
        run_key, algo, 3000, initial_state=state
    )
    samples = np.asarray(states.position)[500:]
    np.testing.assert_allclose(samples.var(0), np.asarray(VARIANCES), rtol=0.35)


def test_pathfinder_adaptation_single_chain(rng_key):
    warmup = blackjax_tpu.pathfinder_adaptation(nuts_mod, logdensity)
    results, info = warmup.run(rng_key, jnp.full(4, 2.0), 200)
    step_size = float(results.parameters["step_size"])
    imm = np.asarray(results.parameters["inverse_mass_matrix"])
    assert np.isfinite(step_size) and step_size > 0
    assert imm.shape == (4, 4)
    # pathfinder's inverse Hessian should approximate the target covariance
    np.testing.assert_allclose(np.diag(imm), np.asarray(VARIANCES), rtol=0.5)


def test_pathfinder_adaptation_multichain(rng_key):
    warmup = blackjax_tpu.pathfinder_adaptation(
        nuts_mod, logdensity, num_chains=4, n_paths=4, num_samples_per_path=100
    )
    results, info = warmup.run(rng_key, jnp.full(4, 2.0), 100)
    assert results.parameters["step_size"].shape == (4,)
    assert results.parameters["inverse_mass_matrix"].shape == (4, 4)
    assert np.isfinite(np.asarray(results.parameters["step_size"])).all()


def test_mclmc_preconditioning_tracks_spectrum(rng_key):
    """Ill-conditioned Gaussian (log-spaced eigenvalues, condition 10 at
    d=100): with diagonal preconditioning the tuned inverse-mass diag must
    align with the eigenvalue spectrum (cosine > 0.9); without it the
    metric stays isotropic. Mirrors the reference's
    ``test_mclmc_preconditioning`` (``tests/mcmc/test_sampling.py:482``)."""
    from blackjax_tpu.mcmc import mclmc as mclmc_mod

    d, condition = 100, 10.0
    eigs = jnp.logspace(-0.5 * np.log10(condition), 0.5 * np.log10(condition), d)
    ill_logdensity = lambda x: -0.5 * jnp.sum(x**2 / eigs)

    init_key, tune_key = jax.random.split(rng_key)
    position = jax.random.normal(init_key, (d,)) * jnp.sqrt(eigs.max())
    kernel = mclmc_mod.build_kernel()

    def tune(preconditioning):
        state = mclmc_mod.init(position, ill_logdensity, init_key)
        _, params, _ = blackjax_tpu.mclmc_find_L_and_step_size(
            kernel, 10000, state, tune_key,
            logdensity_fn=ill_logdensity,
            diagonal_preconditioning=preconditioning,
        )
        return np.asarray(params.inverse_mass_matrix)

    imm = tune(True)
    spectrum_alignment = float(
        np.dot(imm**2 / np.linalg.norm(imm**2), eigs / np.linalg.norm(eigs))
    )
    assert abs(spectrum_alignment - 1.0) < 0.1

    imm_off = tune(False)
    np.testing.assert_allclose(imm_off, np.ones(d))
