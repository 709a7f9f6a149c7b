"""Nested sampling: evidence recovery on an analytically tractable Gaussian
model, posterior resampling, and the SwiG variant."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import blackjax_tpu
from blackjax_tpu.ns import utils as ns_utils

# Gaussian prior N(0, sigma_pi^2 I), Gaussian likelihood N(mu, sigma_l^2 I).
# Analytic evidence: logZ = sum_i log N(mu_i; 0, sigma_pi^2 + sigma_l^2).
D = 2
SIGMA_PI, SIGMA_L = 2.0, 0.5
MU = jnp.array([0.5, -0.3])


def logprior(x):
    return -0.5 * jnp.sum(x**2 / SIGMA_PI**2) - 0.5 * D * jnp.log(
        2 * jnp.pi * SIGMA_PI**2
    )


def loglik(x):
    return -0.5 * jnp.sum((x - MU) ** 2 / SIGMA_L**2) - 0.5 * D * jnp.log(
        2 * jnp.pi * SIGMA_L**2
    )


TRUE_LOGZ = float(
    -0.5 * jnp.sum(MU**2 / (SIGMA_PI**2 + SIGMA_L**2))
    - 0.5 * D * jnp.log(2 * jnp.pi * (SIGMA_PI**2 + SIGMA_L**2))
)
POST_VAR = 1.0 / (1.0 / SIGMA_PI**2 + 1.0 / SIGMA_L**2)
POST_MEAN = np.asarray(MU) * POST_VAR / SIGMA_L**2


def _run_ns(algo, rng_key, num_live=400, num_steps=1200):
    init_key, run_key = jax.random.split(rng_key)
    positions = SIGMA_PI * jax.random.normal(init_key, (num_live, D))
    state = algo.init(positions, rng_key=init_key)

    step = jax.jit(algo.step)
    dead = []
    for i in range(num_steps):
        run_key, subkey = jax.random.split(run_key)
        state, info = step(subkey, state)
        dead.append(info)
    return state, dead


def test_nss_evidence_and_posterior(rng_key):
    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=5, num_delete=20)
    state, dead = _run_ns(algo, rng_key, num_steps=120)

    # evidence from the on-line integrator (dead + live contributions)
    logz = float(jnp.logaddexp(state.integrator.logZ, state.integrator.logZ_live))
    assert abs(logz - TRUE_LOGZ) < 0.35, (logz, TRUE_LOGZ)

    # posterior resampling from the finalised dead set
    final = ns_utils.finalise(state, dead)
    samples = ns_utils.sample(rng_key, final, 2000)
    np.testing.assert_allclose(np.asarray(samples.position).mean(0), POST_MEAN, atol=0.1)
    eff = float(ns_utils.ess(rng_key, final))
    assert eff > 50


def test_nsswig_runs(rng_key):
    algo = blackjax_tpu.nsswig(logprior, loglik, num_inner_steps=3, num_delete=10)
    state, dead = _run_ns(algo, rng_key, num_live=200, num_steps=60)
    assert np.isfinite(float(state.integrator.logZ))
    assert float(state.particles.loglikelihood.min()) > -1e10


@pytest.mark.slow
def test_nsswig_evidence_and_posterior(rng_key):
    """The SwiG inner kernel must pass the same statistical gate as plain
    NSS: analytic evidence within tolerance, posterior mean recovered from
    the finalized dead set."""
    algo = blackjax_tpu.nsswig(logprior, loglik, num_inner_steps=5, num_delete=20)
    state, dead = _run_ns(algo, rng_key, num_steps=120)

    logz = float(jnp.logaddexp(state.integrator.logZ, state.integrator.logZ_live))
    assert abs(logz - TRUE_LOGZ) < 0.35, (logz, TRUE_LOGZ)

    final = ns_utils.finalise(state, dead)
    samples = ns_utils.sample(rng_key, final, 2000)
    np.testing.assert_allclose(
        np.asarray(samples.position).mean(0), POST_MEAN, atol=0.1
    )
    assert float(ns_utils.ess(rng_key, final)) > 50


def test_compute_num_live_constant_run():
    """For a standard single-delete run, the effective live count at every
    death equals num_live."""
    from blackjax_tpu.ns.base import NSInfo, StateWithLogLikelihood

    n_live, n_dead = 50, 200
    rng = np.random.default_rng(0)
    # births: first n_live at -inf (NaN birth), then each dead spawns one birth
    deaths = np.sort(rng.normal(size=n_dead))
    births = np.concatenate([np.full(n_live, np.nan), deaths[: n_dead - n_live]])
    info = NSInfo(
        StateWithLogLikelihood(
            position=jnp.zeros((n_dead, 1)),
            logdensity=jnp.zeros(n_dead),
            loglikelihood=jnp.asarray(deaths),
            loglikelihood_birth=jnp.asarray(births),
        ),
        None,
    )
    num_live = np.asarray(ns_utils.compute_num_live(info))
    assert num_live.max() <= n_live + 1
    assert (num_live[: n_dead - n_live] >= n_live - 1).all()


def test_delete_fn_picks_lowest_likelihoods():
    from blackjax_tpu.ns import base as ns_base

    loglik = jnp.array([3.0, -1.0, 2.0, 0.5, -4.0, 1.5])
    state = ns_base.NSState(
        ns_base.StateWithLogLikelihood(
            position=jnp.zeros((6, 2)),
            logdensity=jnp.zeros(6),
            loglikelihood=loglik,
            loglikelihood_birth=jnp.full(6, -jnp.inf),
        )
    )
    dead_idx, target_idx = ns_base.delete_fn(state, 2)
    assert set(np.asarray(dead_idx).tolist()) == {4, 1}  # -4.0 and -1.0
    np.testing.assert_array_equal(np.asarray(dead_idx), np.asarray(target_idx))


def test_integrator_constant_likelihood_is_exact():
    """With L(x) = c everywhere, Z = c * integral dX = c: the combined
    dead+live evidence must equal c after every update, and the volume must
    compress by exactly -k/n per k-deletion batch (in expectation-free
    arithmetic, since the 1/n shrinkage is deterministic here)."""
    from blackjax_tpu.ns.base import StateWithLogLikelihood
    from blackjax_tpu.ns.integrator import init_integrator, update_integrator

    tight = 1e-10 if jax.config.jax_enable_x64 else 2e-5
    c, n, k = -2.5, 100, 10
    mk = lambda m: StateWithLogLikelihood(
        position=jnp.zeros((m, 1)),
        logdensity=jnp.zeros(m),
        loglikelihood=jnp.full(m, c),
        loglikelihood_birth=jnp.full(m, -jnp.inf),
    )
    state = mk(n)
    integ = init_integrator(state)
    np.testing.assert_allclose(
        float(jnp.logaddexp(integ.logZ, integ.logZ_live)), c, rtol=tight
    )
    expected_logX = 0.0
    for _ in range(5):
        integ = update_integrator(integ, mk(n), mk(k))
        expected_logX += float(jnp.sum(-1.0 / jnp.arange(n, n - k, -1)))
        np.testing.assert_allclose(
            float(jnp.logaddexp(integ.logZ, integ.logZ_live)), c, rtol=tight
        )
        np.testing.assert_allclose(float(integ.logX), expected_logX, rtol=tight)


def test_evidence_monotone_and_volume_shrinks(rng_key):
    """Across a live NSS run the dead-point evidence must be nondecreasing
    and the log prior volume strictly decreasing."""
    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=3, num_delete=10)
    positions = SIGMA_PI * jax.random.normal(rng_key, (100, D))
    state = algo.init(positions, rng_key=rng_key)
    step = jax.jit(algo.step)
    logzs, logxs = [], []
    key = rng_key
    for _ in range(30):
        key, subkey = jax.random.split(key)
        state, _ = step(subkey, state)
        logzs.append(float(state.integrator.logZ))
        logxs.append(float(state.integrator.logX))
    assert all(b >= a for a, b in zip(logzs, logzs[1:]))
    assert all(b < a for a, b in zip(logxs, logxs[1:]))


def test_nss_direction_mahalanobis_length(rng_key):
    """Directions drawn from a covariance factor must have Mahalanobis
    length exactly 2 under that covariance, and their Euclidean geometry
    must reflect the covariance anisotropy."""
    from blackjax_tpu.ns.nss import sample_direction_from_covariance

    cov = jnp.diag(jnp.array([9.0, 0.25]))
    pos = jnp.zeros(2)
    dirs = jnp.stack(
        [
            sample_direction_from_covariance(jax.random.fold_in(rng_key, i), pos, cov)
            for i in range(200)
        ]
    )
    maha = jnp.einsum("nd,dc,nc->n", dirs, jnp.linalg.inv(cov), dirs)
    np.testing.assert_allclose(np.asarray(maha), 4.0, rtol=1e-5)
    # anisotropy: the long axis dominates in Euclidean length
    assert float(jnp.abs(dirs[:, 0]).mean()) > 3.0 * float(jnp.abs(dirs[:, 1]).mean())


def test_nss_covariance_proposal_gates_on_contour(rng_key):
    """The hit-and-run slice function must mark points valid exactly when
    their likelihood exceeds the contour threshold."""
    import functools

    from blackjax_tpu.ns.base import init_state_strategy
    from blackjax_tpu.ns.nss import covariance_proposal

    init_fn = functools.partial(
        init_state_strategy, logprior_fn=logprior, loglikelihood_fn=loglik
    )
    contour = loglik(jnp.array([0.8, -0.5]))  # threshold at a known point
    gen = covariance_proposal(init_fn, contour, cov=jnp.eye(2))
    slice_fn = gen(rng_key, jnp.asarray(MU), loglik)

    probe_in, valid_in = slice_fn(jnp.asarray(0.0))  # at the likelihood peak
    assert bool(valid_in)
    assert float(probe_in.loglikelihood) > float(contour)
    # far along the direction: outside the contour
    _, valid_out = slice_fn(jnp.asarray(50.0))
    assert not bool(valid_out)


def test_nss_live_callbacks_shapes(rng_key):
    """The adaptive callbacks must emit parameter dicts shaped for the
    kernels: dense cov, its Cholesky factor, and per-axis widths."""
    from blackjax_tpu.ns import nss

    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=2, num_delete=5)
    positions = SIGMA_PI * jax.random.normal(rng_key, (40, D))
    state = algo.init(positions, rng_key=rng_key)

    cov = nss.live_covariance(rng_key, state, None)["cov"]
    factor = nss.live_covariance_factor(rng_key, state, None)["covariance_factor"]
    widths = nss.live_widths(rng_key, state, None)["widths"]
    assert cov.shape == (D, D)
    np.testing.assert_allclose(
        np.asarray(factor @ factor.T), np.asarray(cov), rtol=1e-5
    )
    assert widths.shape == (D,)
    np.testing.assert_allclose(
        np.asarray(widths) ** 2, np.diag(np.asarray(cov)), rtol=1e-5
    )


def test_nss_inner_kernel_params_adapt_to_contraction(rng_key):
    """The carried covariance factor must shrink as the live set contracts
    onto the likelihood peak — the adaptation loop is actually adapting."""
    algo = blackjax_tpu.nss(logprior, loglik, num_inner_steps=3, num_delete=10)
    positions = SIGMA_PI * jax.random.normal(rng_key, (100, D))
    state = algo.init(positions, rng_key=rng_key)
    norm0 = float(jnp.linalg.norm(state.inner_kernel_params["covariance_factor"]))
    step = jax.jit(algo.step)
    key = rng_key
    for _ in range(40):
        key, subkey = jax.random.split(key)
        state, _ = step(subkey, state)
    norm1 = float(jnp.linalg.norm(state.inner_kernel_params["covariance_factor"]))
    assert norm1 < 0.6 * norm0, (norm0, norm1)
