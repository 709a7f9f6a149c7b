"""Mesh-sharded SMC: the ring resample-exchange must reproduce the
single-device resampling kernels exactly, the sharded step must match the
lockstep step, and the full sharded tempering loop must recover a tractable
posterior + evidence (parity targets: ``blackjax/smc/resampling.py:129-158``,
``smc/base.py:98-176``, ``smc/tempered.py``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec

import blackjax_tpu.parallel.smc as psmc
from blackjax_tpu.mcmc import mala
from blackjax_tpu.smc import base as smc_base
from blackjax_tpu.smc import resampling


def particles_mesh():
    return Mesh(np.array(jax.devices()[:8]), ("particles",))


N = 64


def _random_weights(key, n=N):
    w = jax.random.uniform(key, (n,)) + 1e-3
    return w / w.sum()


@pytest.mark.parametrize("scheme", ["systematic", "stratified", "multinomial"])
def test_sharded_resampler_matches_single_device(rng_key, scheme):
    """Same key, same weights -> same global ancestor indices."""
    key_w, key_r = jax.random.split(rng_key)
    weights = _random_weights(key_w)
    reference = getattr(resampling, scheme)(key_r, weights, N)

    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    resample = psmc.make_resampler(scheme, "particles")

    def run(key, w, parts):
        out, anc = resample(key, w, parts)
        return out, anc

    sharded = jax.shard_map(
        run, mesh=mesh, in_specs=(rep, p, p), out_specs=(p, p), check_vma=False
    )
    particles = jnp.arange(N) * 1.0
    out, ancestors = sharded(key_r, weights, particles)

    np.testing.assert_array_equal(np.asarray(ancestors), np.asarray(reference))
    # the exchanged particles are exactly the gathered ancestors
    np.testing.assert_array_equal(np.asarray(out), np.asarray(particles[reference]))


def test_sharded_resampler_pytree_and_matrix_leaves(rng_key):
    """The ring exchange must move every leaf, including >1-D ones."""
    key_w, key_r = jax.random.split(rng_key)
    weights = _random_weights(key_w)
    reference = resampling.systematic(key_r, weights, N)

    particles = {
        "x": jnp.arange(N) * 1.0,
        "m": (jnp.arange(N * 3) * 1.0).reshape(N, 3),
    }
    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    resample = psmc.make_resampler("systematic", "particles")
    sharded = jax.shard_map(
        lambda k, w, parts: resample(k, w, parts)[0],
        mesh=mesh,
        in_specs=(rep, p, jax.tree.map(lambda _: p, particles)),
        out_specs=jax.tree.map(lambda _: p, particles),
        check_vma=False,
    )
    out = sharded(key_r, weights, particles)
    np.testing.assert_array_equal(np.asarray(out["x"]), np.asarray(particles["x"][reference]))
    np.testing.assert_array_equal(np.asarray(out["m"]), np.asarray(particles["m"][reference]))


def test_sharded_resampler_num_resampled(rng_key):
    """Waste-free-style reduced resample: M < N global output slots, same
    ancestors as the single-device kernel asked for M samples."""
    key_w, key_r = jax.random.split(rng_key)
    weights = _random_weights(key_w)
    M = 16
    reference = resampling.systematic(key_r, weights, M)

    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    resample = psmc.make_resampler("systematic", "particles", num_resampled=M)
    particles = jnp.arange(N) * 1.0
    out, anc = jax.shard_map(
        lambda k, w, parts: resample(k, w, parts),
        mesh=mesh,
        in_specs=(rep, p, p),
        out_specs=(p, p),
        check_vma=False,
    )(key_r, weights, particles)
    assert out.shape == (M,)
    np.testing.assert_array_equal(np.asarray(anc), np.asarray(reference))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(particles[reference]))


def test_sharded_log_ess_matches_global(rng_key):
    from blackjax_tpu.smc.ess import log_ess as log_ess_single

    logw = jax.random.normal(rng_key, (N,))
    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    sharded = jax.shard_map(
        lambda x: psmc.log_ess(x, "particles"),
        mesh=mesh,
        in_specs=(p,),
        out_specs=rep,
        check_vma=False,
    )
    np.testing.assert_allclose(
        float(sharded(logw)), float(log_ess_single(logw)),
        rtol=1e-10 if jax.config.jax_enable_x64 else 1e-5
    )


def test_sharded_step_matches_lockstep(rng_key):
    """With an identity move, the sharded step must produce the same
    particles, weights, and log-normalizer increment as base.step."""
    key_w, key_step = jax.random.split(rng_key)
    weights = _random_weights(key_w)
    particles = jnp.linspace(-3.0, 3.0, N)

    identity_update = lambda keys, parts, params: (parts, None)
    weight_fn = lambda parts: -0.5 * parts**2

    ref_state, ref_info = smc_base.step(
        key_step,
        smc_base.SMCState(particles, weights, {}),
        identity_update,
        weight_fn,
        resampling.systematic,
    )

    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    resample = psmc.make_resampler("systematic", "particles")

    def run(key, w, parts):
        state, info = psmc.sharded_step(
            key,
            smc_base.SMCState(parts, w, {}),
            identity_update,
            weight_fn,
            resample,
            "particles",
        )
        return state.particles, state.weights, info.log_likelihood_increment

    sharded = jax.shard_map(
        run, mesh=mesh, in_specs=(rep, p, p), out_specs=(p, p, rep), check_vma=False
    )
    parts, w, inc = sharded(key_step, weights, particles)
    np.testing.assert_array_equal(np.asarray(parts), np.asarray(ref_state.particles))
    np.testing.assert_allclose(np.asarray(w), np.asarray(ref_state.weights), rtol=1e-12)
    np.testing.assert_allclose(
        float(inc), float(ref_info.log_likelihood_increment), rtol=1e-12
    )


def test_sharded_tempered_with_per_particle_parameters(rng_key):
    """Unshared (per-slot) MCMC parameters shard alongside the particles and
    reach the kernel row-wise; the run must execute and stay finite."""
    d, n_particles = 2, 64
    obs = jnp.array([1.0, -0.5])
    result = psmc.run_adaptive_tempered_smc(
        rng_key,
        3.0 * jax.random.normal(jax.random.key(5), (n_particles, d)),
        lambda x: -0.5 * jnp.sum(x**2) / 9.0,
        lambda x: -0.5 * jnp.sum((x - obs) ** 2),
        mala.build_kernel(),
        mala.init,
        # per-particle step sizes (leading axis == n_particles => unshared)
        {"step_size": jnp.linspace(0.05, 0.3, n_particles)},
        particles_mesh(),
        target_ess=0.5,
        num_mcmc_steps=2,
        max_steps=30,
    )
    assert float(result.tempering_param) == pytest.approx(1.0)
    assert np.all(np.isfinite(np.asarray(result.particles)))


def test_sharded_waste_free_tempered(rng_key):
    """Waste-free rejuvenation on the mesh: resample N/p global seeds through
    the reduced exchange, expand shard-locally back to N, recover the
    conjugate posterior (reference strategy: ``blackjax/smc/waste_free.py``)."""
    d = 2
    sigma0 = 3.0
    obs = jnp.array([1.0, -0.5])
    post_var = 1.0 / (1.0 / sigma0**2 + 1.0)
    post_mean = post_var * obs

    n_particles, p_len = 512, 4
    key_init, key_run = jax.random.split(rng_key)
    initial = sigma0 * jax.random.normal(key_init, (n_particles, d))

    result = psmc.run_adaptive_tempered_smc(
        key_run,
        initial,
        lambda x: -0.5 * jnp.sum(x**2) / sigma0**2,
        lambda x: -0.5 * jnp.sum((x - obs) ** 2),
        mala.build_kernel(),
        mala.init,
        {"step_size": 0.2},
        particles_mesh(),
        target_ess=0.6,
        num_mcmc_steps=None,
        waste_free_p=p_len,
        max_steps=60,
    )
    assert float(result.tempering_param) == pytest.approx(1.0)
    parts = np.asarray(result.particles)
    assert parts.shape == (n_particles, d)  # the cloud returns to N
    w = np.asarray(result.weights)
    mean = (w[:, None] * parts).sum(0)
    var = (w[:, None] * (parts - mean) ** 2).sum(0)
    # Tolerance justified by a 24-seed sweep of THIS config (round 4): the
    # waste-free estimator is unbiased on the mesh (per-dim signed-error
    # means [0.002, -0.031], t-stats [0.14, -1.48]) but carries the MC noise
    # of N/p = 128 *independent* seeds, not N = 512 particles: per-dim
    # sampling std ~= [0.068, 0.101]. atol = 0.35 ~= 3.2 sigma of the worse
    # dim => <0.5% daily-seed failure risk (0.2 was ~2 sigma: 8% measured).
    np.testing.assert_allclose(mean, np.asarray(post_mean), atol=0.35)
    np.testing.assert_allclose(var, post_var, atol=0.3)


def test_sharded_waste_free_rejects_per_particle_params(rng_key):
    with pytest.raises(ValueError, match="shared"):
        psmc.run_adaptive_tempered_smc(
            rng_key,
            jax.random.normal(jax.random.key(0), (64, 2)),
            lambda x: -0.5 * jnp.sum(x**2),
            lambda x: -0.5 * jnp.sum(x**2),
            mala.build_kernel(),
            mala.init,
            {"step_size": jnp.linspace(0.05, 0.3, 64)},
            particles_mesh(),
            num_mcmc_steps=None,
            waste_free_p=4,
        )


@pytest.mark.slow
def test_sharded_adaptive_tempered_recovers_posterior(rng_key):
    """Conjugate check: prior N(0, sigma0^2 I), likelihood N(mu | x, I) on d
    dims. The sharded tempering loop must recover the analytic posterior
    moments and log-evidence."""
    d = 2
    sigma0 = 3.0
    obs = jnp.array([1.0, -0.5])

    logprior_fn = lambda x: -0.5 * jnp.sum(x**2) / sigma0**2 - 0.5 * d * jnp.log(
        2 * jnp.pi * sigma0**2
    )
    loglikelihood_fn = lambda x: -0.5 * jnp.sum((x - obs) ** 2) - 0.5 * d * jnp.log(
        2 * jnp.pi
    )

    # analytic posterior & evidence
    post_var = 1.0 / (1.0 / sigma0**2 + 1.0)
    post_mean = post_var * obs
    evidence_cov = (sigma0**2 + 1.0) * jnp.eye(d)
    log_evidence = float(
        -0.5 * obs @ jnp.linalg.solve(evidence_cov, obs)
        - 0.5 * jnp.linalg.slogdet(2 * jnp.pi * evidence_cov)[1]
    )

    n_particles = 2048
    key_init, key_run = jax.random.split(rng_key)
    initial = sigma0 * jax.random.normal(key_init, (n_particles, d))

    result = psmc.run_adaptive_tempered_smc(
        key_run,
        initial,
        logprior_fn,
        loglikelihood_fn,
        mala.build_kernel(),
        mala.init,
        {"step_size": 0.15},
        particles_mesh(),
        target_ess=0.7,
        num_mcmc_steps=10,
    )

    assert float(result.tempering_param) == pytest.approx(1.0)
    assert int(result.num_steps) < 100

    w = np.asarray(result.weights)
    parts = np.asarray(result.particles)
    mean = (w[:, None] * parts).sum(0)
    var = (w[:, None] * (parts - mean) ** 2).sum(0)
    np.testing.assert_allclose(mean, np.asarray(post_mean), atol=0.1)
    np.testing.assert_allclose(var, post_var, atol=0.1)
    assert float(result.log_likelihood) == pytest.approx(log_evidence, abs=0.2)


def test_sharded_inner_kernel_tuning_adapts_mass_matrix(rng_key):
    """Mesh analogue of smc.inner_kernel_tuning: after every tempering step
    the HMC inverse mass matrix is re-tuned from the GLOBAL particle cloud
    (psum'd moments via mass_matrix_from_particles). The final override must
    track the posterior scales and the posterior must be recovered."""
    from blackjax_tpu.mcmc import hmc

    d = 4
    post_var = jnp.array([1.0, 4.0, 0.25, 2.0])
    sigma0 = 4.0
    # prior N(0, sigma0^2); likelihood chosen so the posterior has post_var:
    # 1/post_var = 1/sigma0^2 + 1/lik_var
    lik_var = 1.0 / (1.0 / post_var - 1.0 / sigma0**2)

    logprior_fn = lambda x: -0.5 * jnp.sum(x**2) / sigma0**2
    loglikelihood_fn = lambda x: -0.5 * jnp.sum(x**2 / lik_var)

    def tune(key, state, info, params):
        imm = psmc.mass_matrix_from_particles(state.particles, "particles")
        return {**params, "inverse_mass_matrix": imm[None]}

    result = psmc.run_adaptive_tempered_smc(
        rng_key,
        sigma0 * jax.random.normal(jax.random.key(2), (512, d)),
        logprior_fn,
        loglikelihood_fn,
        hmc.build_kernel(),
        hmc.init,
        {
            "step_size": 0.4,
            "inverse_mass_matrix": jnp.full((1, d), sigma0**2),
            "num_integration_steps": 5,
        },
        particles_mesh(),
        target_ess=0.6,
        num_mcmc_steps=3,
        max_steps=60,
        mcmc_parameter_update_fn=tune,
    )
    assert float(result.tempering_param) == pytest.approx(1.0)
    final_imm = np.asarray(result.mcmc_parameters["inverse_mass_matrix"])[0]
    # the override is derived from the CURRENT cloud, so the final value lags
    # one tempering step (a slightly wider-than-posterior distribution):
    # assert each scale within a factor 2 and the anisotropy ordering exact
    ratio = final_imm / np.asarray(post_var)
    assert np.all((ratio > 0.5) & (ratio < 2.0)), final_imm
    np.testing.assert_array_equal(np.argsort(final_imm), np.argsort(np.asarray(post_var)))
    w = np.asarray(result.weights)
    parts = np.asarray(result.particles)
    var = (w[:, None] * parts**2).sum(0) - ((w[:, None] * parts).sum(0)) ** 2
    np.testing.assert_allclose(var, np.asarray(post_var), rtol=0.4)


def test_sharded_pretuning_parameters_follow_particles(rng_key):
    """Pretuning composition: a per-particle step-size population rides the
    resample via ring_gather(info.ancestors) and is then perturbed
    shard-locally. The run must temper to 1 with the population staying
    positive, finite, and diverse, and the posterior recovered."""
    from blackjax_tpu.parallel.exchange import ring_gather

    d, n_particles = 2, 128
    obs = jnp.array([1.0, -0.5])

    def pretune(key, state, info, params):
        moved = ring_gather(
            {"step_size": params["step_size"]}, info.ancestors, "particles"
        )
        local_key = jax.random.fold_in(
            key, jax.lax.axis_index("particles")
        )
        jitter = jnp.exp(
            0.15 * jax.random.normal(local_key, moved["step_size"].shape)
        )
        return {**params, "step_size": jnp.clip(moved["step_size"] * jitter, 1e-3, 1.0)}

    result = psmc.run_adaptive_tempered_smc(
        rng_key,
        3.0 * jax.random.normal(jax.random.key(9), (n_particles, d)),
        lambda x: -0.5 * jnp.sum(x**2) / 9.0,
        lambda x: -0.5 * jnp.sum((x - obs) ** 2),
        mala.build_kernel(),
        mala.init,
        {"step_size": jnp.full(n_particles, 0.15)},  # per-particle population
        particles_mesh(),
        target_ess=0.5,
        num_mcmc_steps=2,
        max_steps=40,
        mcmc_parameter_update_fn=pretune,
    )
    assert float(result.tempering_param) == pytest.approx(1.0)
    steps = np.asarray(result.mcmc_parameters["step_size"])
    assert steps.shape == (n_particles,)
    assert np.all((steps > 0) & np.isfinite(steps))
    assert steps.std() > 0  # the population actually diversified
    post_var = 1.0 / (1.0 / 9.0 + 1.0)
    w = np.asarray(result.weights)
    parts = np.asarray(result.particles)
    mean = (w[:, None] * parts).sum(0)
    # Tolerance from a 12-seed sweep (round 4): at 128 particles with only
    # 2 MALA rejuvenation steps per stage the posterior-mean error has
    # per-dim std ~0.09-0.10 plus a small short-budget burn-in offset
    # (observed max-abs 0.27); this test pins the pretuning PLUMBING
    # (population rides the resample, stays diverse) -- 0.45 ~= offset +
    # 3.5 sigma keeps daily red risk under ~0.5% without weakening it.
    np.testing.assert_allclose(mean, post_var * np.asarray(obs), atol=0.45)


def test_make_sharded_pretune_public_api(rng_key):
    """The first-class pretuning API (probe ESJD -> global population
    resample through the ring -> shard-local jitter) must temper to 1 with
    a positive, diverse step-size population and recover the posterior."""
    d, n_particles = 2, 128
    obs = jnp.array([1.0, -0.5])
    logprior = lambda x: -0.5 * jnp.sum(x**2) / 9.0
    loglik = lambda x: -0.5 * jnp.sum((x - obs) ** 2)

    pretune = psmc.make_sharded_pretune(
        logprior,
        loglik,
        mala.build_kernel(),
        mala.init,
        sigma_parameters={"step_size": 0.03},
        alpha=1.0,
        positive_parameters=("step_size",),
    )
    result = psmc.run_adaptive_tempered_smc(
        rng_key,
        3.0 * jax.random.normal(jax.random.key(9), (n_particles, d)),
        logprior,
        loglik,
        mala.build_kernel(),
        mala.init,
        {"step_size": jnp.full(n_particles, 0.15)},
        particles_mesh(),
        target_ess=0.5,
        num_mcmc_steps=2,
        max_steps=40,
        mcmc_parameter_update_fn=pretune,
    )
    assert float(result.tempering_param) == pytest.approx(1.0)
    steps = np.asarray(result.mcmc_parameters["step_size"])
    assert steps.shape == (n_particles,)
    assert np.all((steps > 0) & np.isfinite(steps))
    assert steps.std() > 0
    post_var = 1.0 / (1.0 / 9.0 + 1.0)
    w = np.asarray(result.weights)
    parts = np.asarray(result.particles)
    mean = (w[:, None] * parts).sum(0)
    # Tolerance from a 12-seed sweep (round 4): at 128 particles with only
    # 2 MALA rejuvenation steps per stage the posterior-mean error has
    # per-dim std ~0.09-0.10 plus a small short-budget burn-in offset
    # (observed max-abs 0.27); this test pins the pretuning PLUMBING
    # (population rides the resample, stays diverse) -- 0.45 ~= offset +
    # 3.5 sigma keeps daily red risk under ~0.5% without weakening it.
    np.testing.assert_allclose(mean, post_var * np.asarray(obs), atol=0.45)


def test_ring_gather_matches_single_device_ancestor_gather(rng_key):
    """ring_gather with the step's ancestors equals params[ancestors] on one
    device — the exact pretuning resample semantics."""
    from blackjax_tpu.parallel.exchange import ring_gather

    key_w, key_r = jax.random.split(rng_key)
    weights = _random_weights(key_w)
    ancestors_single = resampling.systematic(key_r, weights, N)
    params = jnp.linspace(0.01, 0.5, N)

    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    resample = psmc.make_resampler("systematic", "particles")

    def run(key, w, rows):
        _, anc = resample(key, w, rows)  # rows double as particles here
        return ring_gather(rows, anc, "particles")

    out = jax.shard_map(
        run, mesh=mesh, in_specs=(rep, p, p), out_specs=p, check_vma=False
    )(key_r, weights, params)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(params[ancestors_single])
    )


def test_sharded_resampler_exact_over_many_draws(rng_key):
    """Regression sweep for the shard-boundary claim logic: across many
    random weight vectors every output slot must be claimed and the
    ancestors must equal the single-device kernel exactly (the old
    subtraction-based exclusive scan could open 1-ulp gaps between shard
    spans in which a position was claimed by NO shard)."""
    mesh = particles_mesh()
    p, rep = PartitionSpec("particles"), PartitionSpec()
    resample = psmc.make_resampler("systematic", "particles")
    sharded = jax.shard_map(
        lambda k, w, parts: resample(k, w, parts)[1],
        mesh=mesh,
        in_specs=(rep, p, p),
        out_specs=p,
        check_vma=False,
    )
    particles = jnp.arange(N) * 1.0
    for i in range(25):
        key_w, key_r = jax.random.split(jax.random.fold_in(rng_key, i))
        w = _random_weights(key_w)
        anc = sharded(key_r, w, particles)
        ref = resampling.systematic(key_r, w, N)
        np.testing.assert_array_equal(np.asarray(anc), np.asarray(ref))


def test_sharded_smc_resume_from_checkpoint(rng_key, tmp_path):
    """A sharded tempering run interrupted mid-anneal resumes from an
    orbax-checkpointed ShardedSMCResult and still reaches lambda = 1 with
    the posterior recovered and the evidence accumulated across both legs."""
    from blackjax_tpu.checkpoint import load_state, save_state

    d = 2
    sigma0 = 3.0
    obs = jnp.array([1.0, -0.5])
    post_var = 1.0 / (1.0 / sigma0**2 + 1.0)
    mesh = particles_mesh()
    common = dict(
        logprior_fn=lambda x: -0.5 * jnp.sum(x**2) / sigma0**2,
        loglikelihood_fn=lambda x: -0.5 * jnp.sum((x - obs) ** 2),
        mcmc_step_fn=mala.build_kernel(),
        mcmc_init_fn=mala.init,
        mesh=mesh,
        target_ess=0.9,  # small increments: guarantees an interrupted anneal
        num_mcmc_steps=3,
    )

    leg1 = psmc.run_adaptive_tempered_smc(
        rng_key,
        sigma0 * jax.random.normal(jax.random.key(11), (256, d)),
        mcmc_parameters={"step_size": 0.2},
        max_steps=2,  # interrupt mid-anneal
        **common,
    )
    lam1 = float(leg1.tempering_param)
    assert 0.0 < lam1 < 1.0, lam1

    path = str(tmp_path / "smc_ckpt")
    save_state(path, leg1)
    restored = psmc.ShardedSMCResult(*load_state(path, template=leg1))

    leg2 = psmc.run_adaptive_tempered_smc(
        jax.random.fold_in(rng_key, 1),
        None,
        mcmc_parameters={"step_size": 0.2},
        max_steps=60,
        initial_state=restored,
        **common,
    )
    assert float(leg2.tempering_param) == pytest.approx(1.0)
    w = np.asarray(leg2.weights)
    parts = np.asarray(leg2.particles)
    mean = (w[:, None] * parts).sum(0)
    # ~4 sigma at 256 particles (same error class as the pretune sweep)
    np.testing.assert_allclose(mean, post_var * np.asarray(obs), atol=0.35)
    var = (w[:, None] * parts**2).sum(0) - mean**2
    np.testing.assert_allclose(var, post_var, atol=0.3)
    # evidence accumulated across legs stays finite and sensible
    assert np.isfinite(float(leg2.log_likelihood))
