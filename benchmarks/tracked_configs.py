"""The five tracked benchmark configurations from BASELINE.md, as one
runnable script. Each config prints a JSON line; scales shrink automatically
on CPU so the script doubles as a smoke bench.

Run: ``python benchmarks/tracked_configs.py [config ...]`` where config is
one of hmc, nuts_8schools, sgmcmc, smc, cross_chain (default: all).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import blackjax_tpu
from blackjax_tpu.models.targets import (
    eight_schools_noncentered,
    ill_conditioned_gaussian,
    logistic_regression,
)

ON_TPU = jax.devices()[0].platform != "cpu"
SCALE = 1.0 if ON_TPU else 0.1


def _timed(run, *args):
    out = run(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = run(*args)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    return time.perf_counter() - t0, out


def _emit(name, elapsed, extra):
    print(json.dumps({"config": name, "elapsed_sec": round(elapsed, 4), **extra}))


def config_hmc():
    """Static HMC, 100-dim Gaussian, 128 chains."""
    target = ill_conditioned_gaussian(100)
    num_chains, num_steps = 128, max(int(512 * SCALE), 32)
    algo = blackjax_tpu.hmc(
        target.logdensity_fn,
        step_size=0.1,
        inverse_mass_matrix=jnp.ones(100),
        num_integration_steps=10,
    )
    states = jax.vmap(algo.init)(jnp.zeros((num_chains, 100)))

    @jax.jit
    def run(key, states):
        def one(states, k):
            keys = jax.random.split(k, num_chains)
            states, infos = jax.vmap(algo.step)(keys, states)
            return states, infos.acceptance_rate

        return jax.lax.scan(one, states, jax.random.split(key, num_steps))

    elapsed, (final, acc) = _timed(run, jax.random.key(0), states)
    grads = num_chains * num_steps * 10
    _emit(
        "static_hmc_100d_128c",
        elapsed,
        {
            "grad_evals_per_sec": round(grads / elapsed, 1),
            "mean_acceptance": round(float(jnp.mean(acc)), 3),
        },
    )


def config_nuts_8schools():
    """Eight-schools NUTS + Stan window adaptation."""
    target = eight_schools_noncentered()
    num_steps = max(int(1000 * SCALE), 200)

    def run(key):
        warm_key, sample_key = jax.random.split(key)
        warmup = blackjax_tpu.window_adaptation(
            blackjax_tpu.nuts, target.logdensity_fn
        )
        (state, params), _ = warmup.run(warm_key, jnp.zeros(10), num_steps=400)
        algo = blackjax_tpu.nuts(target.logdensity_fn, **params)
        final, (states, infos) = blackjax_tpu.util.run_inference_algorithm(
            sample_key, algo, num_steps, initial_state=state
        )
        return states.position, infos.num_integration_steps

    elapsed, (samples, nsteps) = _timed(run, jax.random.key(1))
    ess = float(jnp.min(blackjax_tpu.ess(samples[None])))
    _emit(
        "nuts_window_8schools",
        elapsed,
        {
            "min_ess": round(ess, 1),
            "ess_per_sec": round(ess / elapsed, 1),
            "grads": int(jnp.sum(nsteps)),
        },
    )


def config_sgmcmc():
    """MALA + SGLD on synthetic logistic regression."""
    target, X, y = logistic_regression(num_points=2048, dim=25)
    num_steps = max(int(2000 * SCALE), 200)

    mala = blackjax_tpu.mala(target.logdensity_fn, step_size=1e-3)
    state = mala.init(jnp.zeros(25))

    @jax.jit
    def run_mala(key, state):
        def one(s, k):
            s, info = mala.step(k, s)
            return s, info.acceptance_rate

        return jax.lax.scan(one, state, jax.random.split(key, num_steps))

    elapsed, (final, acc) = _timed(run_mala, jax.random.key(2), state)
    _emit(
        "mala_logreg",
        elapsed,
        {
            "steps_per_sec": round(num_steps / elapsed, 1),
            "mean_acceptance": round(float(jnp.mean(acc)), 3),
        },
    )

    from blackjax_tpu.sgmcmc.gradients import grad_estimator

    batch = 256
    # loglikelihood_fn is PER-DATAPOINT (vmapped internally): data = (x_i, y_i)
    grad_fn = grad_estimator(
        lambda w: -0.5 * jnp.sum(w**2) / 10.0,
        lambda w, datum: -jnp.logaddexp(
            0.0, -(2.0 * datum[1] - 1.0) * (datum[0] @ w)
        ),
        data_size=X.shape[0],
    )
    sgld = blackjax_tpu.sgld(grad_fn)
    position = jnp.zeros(25)

    @jax.jit
    def run_sgld(key, position):
        def one(pos, k):
            idx = jax.random.randint(k, (batch,), 0, X.shape[0])
            pos = sgld.step(k, pos, (X[idx], y[idx]), 1e-5)
            return pos, ()

        pos, _ = jax.lax.scan(one, position, jax.random.split(key, num_steps))
        return pos

    elapsed, _ = _timed(run_sgld, jax.random.key(3), position)
    _emit("sgld_logreg", elapsed, {"steps_per_sec": round(num_steps / elapsed, 1)})


def config_smc():
    """Tempered SMC with adaptive tempering + systematic resampling."""
    from blackjax_tpu.smc import resampling
    from blackjax_tpu.smc.base import extend_params

    n_particles = int(16384 * SCALE) if ON_TPU else 1024
    prior = lambda x: -0.5 * jnp.sum(x**2)
    loglik = lambda x: -0.5 * jnp.sum((x - 2.0) ** 2 / 0.25)

    algo = blackjax_tpu.adaptive_tempered_smc(
        prior,
        loglik,
        blackjax_tpu.mala.build_kernel(),
        blackjax_tpu.mala.init,
        mcmc_parameters=extend_params({"step_size": 0.05}),
        resampling_fn=resampling.systematic,
        target_ess=0.5,
        num_mcmc_steps=5,
    )
    particles = jax.random.normal(jax.random.key(4), (n_particles, 10))

    @jax.jit
    def run(key, particles):
        state = algo.init(particles)

        def cond(carry):
            state, _, i = carry
            return (state.tempering_param < 1.0) & (i < 50)

        def body(carry):
            state, key, i = carry
            key, sub = jax.random.split(key)
            state, info = algo.step(sub, state)
            return state, key, i + 1

        state, _, n_stages = jax.lax.while_loop(cond, body, (state, key, 0))
        return state.particles, n_stages

    elapsed, (final_particles, n_stages) = _timed(run, jax.random.key(5), particles)
    _emit(
        "adaptive_tempered_smc",
        elapsed,
        {
            "n_particles": n_particles,
            "n_stages": int(n_stages),
            "posterior_mean_err": round(
                float(jnp.abs(jnp.mean(final_particles) - 2.0 * 0.25 / 1.25 * 4)), 3
            ),
        },
    )


def config_cross_chain():
    """ChEES cross-chain adaptation at scale."""
    import optax

    num_chains = 4096 if ON_TPU else 64
    num_steps = max(int(400 * SCALE), 100)
    variances = jnp.linspace(0.5, 4.0, 8)
    logdensity = lambda x: -0.5 * jnp.sum(x**2 / variances)

    warmup = blackjax_tpu.chees_adaptation(logdensity, num_chains)
    positions = jax.random.normal(jax.random.key(6), (num_chains, 8))

    def run(key):
        (last, params), _ = warmup.run(
            key, positions, 0.1, optax.adam(0.25), num_steps
        )
        return params["step_size"], params["integration_steps_params"][0]

    elapsed, (step_size, steps) = _timed(run, jax.random.key(7))
    _emit(
        "chees_cross_chain",
        elapsed,
        {
            "num_chains": num_chains,
            "adapted_step_size": round(float(step_size), 4),
            "avg_leapfrogs": round(float(steps), 1),
        },
    )


CONFIGS = {
    "hmc": config_hmc,
    "nuts_8schools": config_nuts_8schools,
    "sgmcmc": config_sgmcmc,
    "smc": config_smc,
    "cross_chain": config_cross_chain,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(CONFIGS)
    for name in names:
        CONFIGS[name]()
