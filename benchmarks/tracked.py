"""The non-flagship tracked configs from BASELINE.md, each measured against
the live reference (stock BlackJAX imported from /root/reference) on the
same device.

Called by ``bench.py`` (appended to the one-line JSON under ``"tracked"``);
also runnable directly: ``python -m benchmarks.tracked``.

Comparability notes per config:

- ``hmc`` / ``sgld``: fixed integration work per transition on both sides,
  so transitions/sec (resp. updates/sec) is the honest metric.
- ``nuts_8schools``: both sides warm up with their own window adaptation on
  one chain, then sample 64 vmapped chains; metric is min-ESS/sec measured
  with OUR diagnostics for both.
- ``smc``: full adaptive-tempering run (prior -> posterior) at 16k
  particles; metric is 1/wall-seconds, vs_baseline the wall-time ratio.
- ``cross_chain``: the full ChEES warmup wall time at 4,096 chains (what a
  user pays); adapted trajectory lengths differ by design, so wall time —
  not per-leapfrog throughput — is the comparable quantity.
"""
import json
import os
import sys
import time
import types
from typing import Callable

import jax

# honor JAX_PLATFORMS for CPU smoke runs: the environment's sitecustomize
# pins the axon TPU platform at interpreter startup, silently overriding the
# env var; the config call before first backend use still works (same
# pattern as bench.py)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np

from benchmarks import timing

ON_TPU = jax.devices()[0].platform != "cpu"


def _reference():
    sys.path.insert(0, "/root/reference")
    version_stub = types.ModuleType("blackjax._version")
    version_stub.__version__ = "reference"
    sys.modules.setdefault("blackjax._version", version_stub)
    import blackjax

    return blackjax


def _timeit(fn: Callable, variants) -> float:
    """Compile/warm with ``variants[0]``, then best-of-the-rest.

    EVERY ``variants[i]`` must be a DISTINCT argument tuple: the axon device
    runtime result-caches a repeated identical dispatch (measured
    2026-08-19: an exact repeat of the previous call returns in ~0 ms
    without executing). The run is timed by pulling an on-device checksum
    of every output — ``block_until_ready`` on a raw remote output can
    return before execution completes, and best-of-N over such timings
    selects exactly the artifact runs (benchmarks/timing.py).
    """
    timed = jax.jit(lambda *args: timing.checksum(fn(*args)))
    elapsed, _ = timing.timeit_pull(timed, variants)
    return elapsed


def _min_ess_per_sec(positions, elapsed):
    """positions: (chains, steps, d) -> min-over-dims ESS / sec, computed
    with our diagnostics (used for BOTH sides)."""
    from blackjax_tpu.diagnostics import effective_sample_size

    ess = np.asarray(
        effective_sample_size(np.asarray(positions), chain_axis=0, sample_axis=1)
    )
    return float(np.min(ess) / elapsed)


# --------------------------------------------------------------------------
# 1. static HMC — 100-dim ill-conditioned Gaussian, 128 chains
# --------------------------------------------------------------------------


def config_hmc():
    from blackjax_tpu.models.targets import ill_conditioned_gaussian

    target = ill_conditioned_gaussian(100)
    # 131072 steps: with the overhead-subtracting scalar-pull protocol the
    # subtraction is only trustworthy when the raw run dwarfs the ~30 ms
    # fixed pull cost; our side runs ~70M transitions/s, so anything under
    # ~30k steps is overhead-dominated on this box
    num_chains, num_steps = 128, 131072 if ON_TPU else 64
    params = dict(step_size=0.08, num_integration_steps=10)
    key = jax.random.key(7)
    positions = 0.5 * jax.random.normal(key, (num_chains, 100))

    def measure(algo_factory):
        algo = algo_factory()

        # per-step keys are derived INSIDE the program: a closed-over
        # (131072, 128) key array would be baked into the payload shipped
        # to the remote compiler (HTTP 413 above ~200 MB)
        @jax.jit
        def run(key, states):
            def one(states, k):
                ks = jax.random.split(k, num_chains)
                states, _ = jax.vmap(algo.step)(ks, states)
                return states, states.position[:, 0]

            return jax.lax.scan(one, states, jax.random.split(key, num_steps))

        states0 = jax.vmap(algo.init)(positions)
        variants = [
            (k, states0) for k in jax.random.split(jax.random.key(8), 4)
        ]
        elapsed = _timeit(run, variants)
        return num_chains * num_steps / elapsed

    import blackjax_tpu

    ours = measure(
        lambda: blackjax_tpu.hmc(
            target.logdensity_fn, inverse_mass_matrix=jnp.ones(100), **params
        )
    )

    def ref():
        blackjax = _reference()
        return measure(
            lambda: blackjax.hmc(
                target.logdensity_fn, inverse_mass_matrix=jnp.ones(100), **params
            )
        )

    return {"value": ours, "unit": "transitions/sec"}, ref


def _measure_nuts_best_engine(
    logdensity_fn, parameters, positions, sample_key, num_steps
):
    """Measure OUR NUTS sampling with both engines — the per-step vmapped
    scan and the continuous runner (:func:`mcmc.nuts.build_fused_many_steps`,
    bit-identical samples, no per-step lockstep barrier) — and return
    ``(min_ess_per_sec, engine_name)`` for the better one.

    The reference side keeps its canonical scan-of-vmap (it has no
    continuous runner); our side reports the best engine per VERDICT r3 #1.
    """
    import blackjax_tpu
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    num_chains, d = positions.shape
    algo = blackjax_tpu.nuts(logdensity_fn, **parameters)
    states = jax.vmap(algo.init)(positions)
    # distinct key sets per timed call (see _timeit: a repeated identical
    # dispatch is result-cached by the device runtime)
    key_sets = [
        jax.random.split(k, (num_steps, num_chains))
        for k in jax.random.split(sample_key, 4)
    ]

    # engine A: scan of the vmapped kernel (lockstep per step)
    @jax.jit
    def run_scan(states, keys):
        def one(states, ks):
            states, _ = jax.vmap(algo.step)(ks, states)
            return states, states.position

        return jax.lax.scan(one, states, keys)

    scan_elapsed = _timeit(run_scan, [(states, ks) for ks in key_sets])
    _, hist = run_scan(states, key_sets[0])  # (steps, chains, d)
    scan_ess = _min_ess_per_sec(np.asarray(hist).swapaxes(0, 1), scan_elapsed)

    # engine B: the continuous runner (same keys per (step, chain) =>
    # bit-identical samples; chains flow through transitions barrier-free)
    oversub = 4 if (ON_TPU and num_chains % 4 == 0) else 1
    run_fused = jax.jit(
        build_fused_many_steps(
            logdensity_fn,
            parameters["step_size"],
            parameters["inverse_mass_matrix"],
            num_steps=num_steps,
            oversubscription=oversub,
            unroll=4 if ON_TPU else 1,
        )
    )
    fused_elapsed = _timeit(run_fused, [(ks, states) for ks in key_sets])
    _, fhist, _ = run_fused(key_sets[0], states)  # (chains, steps, d)
    fused_ess = _min_ess_per_sec(np.asarray(fhist), fused_elapsed)

    if fused_ess >= scan_ess:
        return fused_ess, "continuous-runner"
    return scan_ess, "scan-of-vmap"


# --------------------------------------------------------------------------
# 2. NUTS + window adaptation — eight schools, 64 chains
# --------------------------------------------------------------------------


def config_nuts_8schools():
    from blackjax_tpu.models.targets import eight_schools_noncentered

    target = eight_schools_noncentered()
    num_chains, num_steps, num_warmup = (64, 800, 400) if ON_TPU else (16, 200, 200)
    key = jax.random.key(11)
    warm_key, sample_key, pos_key = jax.random.split(key, 3)
    positions = jnp.zeros((num_chains, 10)) + 0.1 * jax.random.normal(
        pos_key, (num_chains, 10)
    )

    def measure(warmup_run, nuts_factory):
        results = warmup_run()
        parameters, state = results
        algo = nuts_factory(parameters)
        states = jax.vmap(algo.init)(positions)
        key_sets = [
            jax.random.split(k, (num_steps, num_chains))
            for k in jax.random.split(sample_key, 4)
        ]

        @jax.jit
        def run(states, keys):
            def one(states, ks):
                states, _ = jax.vmap(algo.step)(ks, states)
                return states, states.position

            return jax.lax.scan(one, states, keys)

        elapsed = _timeit(run, [(states, ks) for ks in key_sets])
        _, hist = run(states, key_sets[0])  # (steps, chains, d)
        return _min_ess_per_sec(np.asarray(hist).swapaxes(0, 1), elapsed)

    from blackjax_tpu.adaptation.window_adaptation import window_adaptation
    from blackjax_tpu.mcmc import nuts as nuts_mod

    res, _ = window_adaptation(nuts_mod, target.logdensity_fn).run(
        warm_key, jnp.zeros(10), num_warmup
    )
    ours, engine = _measure_nuts_best_engine(
        target.logdensity_fn, res.parameters, positions, sample_key, num_steps
    )

    def ref():
        blackjax = _reference()

        def ref_warmup():
            warmup = blackjax.window_adaptation(blackjax.nuts, target.logdensity_fn)
            (state, parameters), _ = warmup.run(warm_key, jnp.zeros(10), num_warmup)
            return parameters, state

        return measure(
            ref_warmup, lambda p: blackjax.nuts(target.logdensity_fn, **p)
        )

    return {"value": ours, "unit": "min-ESS/sec", "engine": engine}, ref


# --------------------------------------------------------------------------
# 3. SGLD — logistic regression (covertype-class), minibatched
# --------------------------------------------------------------------------


def config_sgld():
    # Compiled parity with the reference is PROVEN on this config: XLA cost
    # analysis of the jitted 50-step scan gives identical FLOPs (35,481)
    # and bytes accessed (992,914) for both libraries, and bitwise-equal
    # outputs (tools: /tmp-level HLO diff, round 3). Any wall-clock delta
    # is therefore host-dispatch noise over the device tunnel; the step
    # count below is sized so the run is ~0.5 s and that noise amortizes.
    from blackjax_tpu.models.targets import logistic_regression

    target, X, y = logistic_regression(num_points=4096, dim=54)
    num_steps, batch = (20000, 512) if ON_TPU else (500, 128)
    key = jax.random.key(13)
    data_size = X.shape[0]

    def logprior_fn(w):
        return -0.5 * jnp.sum(w**2)

    def loglikelihood_fn(w, minibatch):
        xb, yb = minibatch
        logits = xb @ w
        return jnp.sum(yb * logits - jnp.logaddexp(0.0, logits))

    batch_keys = jax.random.split(key, num_steps)
    batch_idx = jax.vmap(
        lambda k: jax.random.randint(k, (batch,), 0, data_size)
    )(batch_keys)
    step_keys = jax.random.split(jax.random.key(14), num_steps)
    w0 = jnp.zeros(54)

    def measure(module):
        grad_fn = module.grad_estimator(logprior_fn, loglikelihood_fn, data_size)
        sgld = module_sgld(module, grad_fn)

        @jax.jit
        def run(w):
            def one(w, xs):
                k, idx = xs
                w = sgld(k, w, (X[idx], y[idx]), 1e-5)
                return w, ()

            return jax.lax.scan(one, w, (step_keys, batch_idx))[0]

        variants = [
            (0.01 * jax.random.normal(k, (54,)),)
            for k in jax.random.split(jax.random.key(15), 4)
        ]
        elapsed = _timeit(run, variants)
        return num_steps / elapsed

    def module_sgld(module, grad_fn):
        return module.sgld_step(grad_fn)

    import blackjax_tpu.sgmcmc.gradients as our_gradients
    from blackjax_tpu import sgld as our_sgld

    class OurModule:
        grad_estimator = staticmethod(our_gradients.grad_estimator)
        sgld_step = staticmethod(lambda g: our_sgld(g).step)

    ours = measure(OurModule)

    def ref():
        blackjax = _reference()

        class RefModule:
            grad_estimator = staticmethod(
                blackjax.sgmcmc.gradients.grad_estimator
            )
            sgld_step = staticmethod(lambda g: blackjax.sgld(g).step)

        return measure(RefModule)

    return {"value": ours, "unit": "updates/sec"}, ref


# --------------------------------------------------------------------------
# 4. adaptive tempered SMC — 16k particles, systematic resampling
# --------------------------------------------------------------------------


def config_smc():
    d, n_particles = 10, 16384 if ON_TPU else 2048
    obs = jnp.linspace(-1.0, 1.0, d)
    logprior_fn = lambda x: -0.5 * jnp.sum(x**2) / 9.0
    loglikelihood_fn = lambda x: -0.5 * jnp.sum((x - obs) ** 2)
    key = jax.random.key(17)
    init_particles = 3.0 * jax.random.normal(key, (n_particles, d))

    def measure(pkg, mala_mod, resampling_mod):
        algo = pkg.adaptive_tempered_smc(
            logprior_fn,
            loglikelihood_fn,
            mala_mod.build_kernel(),
            mala_mod.init,
            {"step_size": jnp.full((1,), 0.1)},  # leading-1 axis = shared
            resampling_mod.systematic,
            target_ess=0.5,
            num_mcmc_steps=5,
        )
        state = algo.init(init_particles)
        step = jax.jit(algo.step)

        def full_run(k):
            s = algo.init(init_particles)
            i = 0
            while float(s.tempering_param) < 1.0 and i < 50:
                k, sk = jax.random.split(k)
                s, _ = step(sk, s)
                i += 1
            return s, i

        s, i = full_run(key)  # compile + correctness
        # the run is short (~0.25 s) and paced by per-step host dispatch, so
        # single-shot timing is noisy over the device tunnel: take best-of-3
        # with a DISTINCT key per run (identical dispatches are result-cached
        # by the device runtime — see _timeit)
        elapsed = float("inf")
        for rk in jax.random.split(jax.random.key(18), 3):
            t0 = time.perf_counter()
            s, i = full_run(rk)
            elapsed = min(elapsed, time.perf_counter() - t0)
        return 1.0 / elapsed, elapsed, i

    import blackjax_tpu
    from blackjax_tpu.mcmc import mala as our_mala
    from blackjax_tpu.smc import resampling as our_resampling

    ours, our_elapsed, our_steps = measure(blackjax_tpu, our_mala, our_resampling)

    def ref():
        blackjax = _reference()
        import blackjax.mcmc.mala as ref_mala
        import blackjax.smc.resampling as ref_resampling

        val, _, _ = measure(blackjax, ref_mala, ref_resampling)
        return val

    return {
        "value": ours,
        "unit": "runs/sec (full tempering)",
        "elapsed_sec": round(our_elapsed, 3),
        "tempering_steps": our_steps,
    }, ref


# --------------------------------------------------------------------------
# 5. cross-chain ChEES — 4,096 chains
# --------------------------------------------------------------------------


def config_cross_chain():
    import optax

    from blackjax_tpu.models.targets import ill_conditioned_gaussian

    target = ill_conditioned_gaussian(100)
    num_chains, num_steps = (4096, 1000) if ON_TPU else (256, 50)
    key = jax.random.key(19)
    positions = jax.random.normal(key, (num_chains, 100))

    def measure(chees_factory):
        # grad-normalized: the two libraries adapt to different trajectory
        # lengths by design, so compare leapfrog-gradient throughput, not
        # warmup wall time
        adapt = chees_factory()

        @jax.jit
        def run(key, positions):
            res, info = adapt.run(key, positions, 0.05, optax.adam(0.25), num_steps)
            # AdaptationInfo(state, info, adaptation_state) in both libraries;
            # num_integration_steps is (num_steps, num_chains)
            total_grads = jnp.sum(info.info.num_integration_steps)
            return jax.tree.leaves(res.state)[0].sum(), total_grads

        _, grads = run(key, positions)
        jax.block_until_ready(grads)
        # grads varies <1% across keys at 4,096 chains; the key-variant
        # protocol keeps every timed dispatch distinct
        elapsed = _timeit(
            run, [(k, positions) for k in jax.random.split(key, 4)]
        )
        return float(grads) / elapsed

    from blackjax_tpu.adaptation.chees_adaptation import chees_adaptation

    ours = measure(lambda: chees_adaptation(target.logdensity_fn, num_chains))

    def ref():
        blackjax = _reference()
        return measure(
            lambda: blackjax.chees_adaptation(target.logdensity_fn, num_chains)
        )

    return {"value": ours, "unit": "leapfrog-grads/sec (full warmup)"}, ref


def config_sgld_chains():
    """Many-chain SGMCMC: 4,096 vmapped SGLD chains on the covertype-class
    logistic regression, one shared minibatch per step (the chain-blocked
    TPU regime — per-chain logits become one (C, B) MXU contraction)."""
    from blackjax_tpu.models.targets import logistic_regression

    target, X, y = logistic_regression(num_points=4096, dim=54)
    num_chains = 4096 if ON_TPU else 64
    num_steps, batch = (20000, 256) if ON_TPU else (50, 64)
    key = jax.random.key(23)
    data_size = X.shape[0]

    def logprior_fn(w):
        return -0.5 * jnp.sum(w**2)

    def loglikelihood_fn(w, minibatch):
        xb, yb = minibatch
        logits = xb @ w
        return jnp.sum(yb * logits - jnp.logaddexp(0.0, logits))

    def measure(module):
        grad_fn = module.grad_estimator(logprior_fn, loglikelihood_fn, data_size)
        step = module.sgld_step(grad_fn)

        # minibatch indices and per-(step, chain) keys are derived INSIDE
        # the program: closed-over (steps, chains) key arrays get baked
        # into the remote-compile payload (HTTP 413 at 20k steps)
        @jax.jit
        def run(key, w):
            def one(w, k):
                k_idx, k_step = jax.random.split(k)
                idx = jax.random.randint(k_idx, (batch,), 0, data_size)
                mb = (X[idx], y[idx])
                keys = jax.random.split(k_step, num_chains)
                w = jax.vmap(lambda kk, wi: step(kk, wi, mb, 1e-5))(keys, w)
                return w, ()

            return jax.lax.scan(one, w, jax.random.split(key, num_steps))[
                0
            ].sum()

        w0 = 0.1 * jax.random.normal(jax.random.key(25), (num_chains, 54))
        variants = [
            (k, w0) for k in jax.random.split(jax.random.key(26), 4)
        ]
        elapsed = _timeit(run, variants)
        return num_chains * num_steps / elapsed

    import blackjax_tpu.sgmcmc.gradients as our_gradients
    from blackjax_tpu import sgld as our_sgld

    class OurModule:
        grad_estimator = staticmethod(our_gradients.grad_estimator)
        sgld_step = staticmethod(lambda g: our_sgld(g).step)

    ours = measure(OurModule)

    def ref():
        blackjax = _reference()

        class RefModule:
            grad_estimator = staticmethod(blackjax.sgmcmc.gradients.grad_estimator)
            sgld_step = staticmethod(lambda g: blackjax.sgld(g).step)

        return measure(RefModule)

    return {"value": ours, "unit": "chain-updates/sec"}, ref


def config_meads():
    """BASELINE.md tracked config #5, MEADS side: full cross-chain GHMC
    warmup wall time at 4,096 chains. Every MEADS step is one GHMC leapfrog
    per chain on both sides, so chain-steps/sec is the honest metric."""
    from blackjax_tpu.models.targets import ill_conditioned_gaussian

    target = ill_conditioned_gaussian(100)
    num_chains, num_steps = (4096, 1000) if ON_TPU else (256, 40)
    key = jax.random.key(29)
    positions = jax.random.normal(key, (num_chains, 100))

    def measure(meads_factory):
        adapt = meads_factory()

        @jax.jit
        def run(key, positions):
            res, _ = adapt.run(key, positions, num_steps)
            return jax.tree.leaves(res.state)[0].sum()

        best = _timeit(
            run, [(k, positions) for k in jax.random.split(key, 3)]
        )
        return num_chains * num_steps / best

    from blackjax_tpu.adaptation.meads_adaptation import meads_adaptation

    ours = measure(lambda: meads_adaptation(target.logdensity_fn, num_chains))

    def ref():
        blackjax = _reference()
        return measure(
            lambda: blackjax.meads_adaptation(target.logdensity_fn, num_chains)
        )

    return {"value": ours, "unit": "chain-steps/sec (full warmup)"}, ref


def config_horseshoe():
    """Finnish (regularized) horseshoe sparse regression at the reference
    benchmark's scale (N=100, M=200, d=404 — the reference's heaviest
    benchmark posterior, ``tests/test_benchmarks.py:65``). Warmup runs ONCE
    (ours) and the adapted parameters are shared by both sides, so the
    measured quantity is pure NUTS sampling ESS/sec on a realistic
    correlated posterior."""
    from blackjax_tpu.models.targets import finnish_horseshoe

    target = finnish_horseshoe()  # N=100, M=200, d=404
    d = target.dim
    num_chains, num_steps, num_warmup = (64, 400, 600) if ON_TPU else (8, 80, 200)
    key = jax.random.key(31)
    warm_key, sample_key, pos_key = jax.random.split(key, 3)
    positions = 0.05 * jax.random.normal(pos_key, (num_chains, d))

    from blackjax_tpu.adaptation.window_adaptation import window_adaptation
    from blackjax_tpu.mcmc import nuts as nuts_mod

    results, _ = window_adaptation(nuts_mod, target.logdensity_fn).run(
        warm_key, jnp.zeros(d), num_warmup
    )
    parameters = results.parameters

    def measure(nuts_factory):
        algo = nuts_factory(parameters)
        states = jax.vmap(algo.init)(positions)
        key_sets = [
            jax.random.split(k, (num_steps, num_chains))
            for k in jax.random.split(sample_key, 4)
        ]

        @jax.jit
        def run(states, keys):
            def one(states, ks):
                states, _ = jax.vmap(algo.step)(ks, states)
                return states, states.position

            return jax.lax.scan(one, states, keys)

        elapsed = _timeit(run, [(states, ks) for ks in key_sets])
        _, hist = run(states, key_sets[0])  # (steps, chains, d)
        return _min_ess_per_sec(np.asarray(hist).swapaxes(0, 1), elapsed)

    ours, engine = _measure_nuts_best_engine(
        target.logdensity_fn, parameters, positions, sample_key, num_steps
    )

    extras = {}
    if ON_TPU:
        # The dc Pallas machine on the SAME adapted posterior: it tracks 8
        # of 404 coordinates (VMEM history), so min-ESS-over-all-dims is
        # not its metric — report leapfrog-grads/s against the XLA
        # continuous runner at identical (step size, metric). ESS/grad is
        # equal in distribution across engines (same algorithm,
        # documented-equivalent RNG streams), so this ratio is the
        # throughput story for the matmul class.
        try:
            import blackjax_tpu
            from blackjax_tpu.mcmc.nuts import build_fused_many_steps
            from blackjax_tpu.ops.fused_nuts_dc import fused_nuts_run_dc
            from blackjax_tpu.ops.targets_dc import (
                horseshoe_dc_perm,
                make_finnish_horseshoe_target_dc,
            )

            dc_target = make_finnish_horseshoe_target_dc()
            to_dc, _ = horseshoe_dc_perm(200)
            imm_dc = jnp.asarray(parameters["inverse_mass_matrix"])[to_dc]
            eps = float(parameters["step_size"])
            n_dc = 512  # one 128-lane tile at pack=4
            dc_pos = [
                0.05 * jax.random.normal(k, (n_dc, d))[:, to_dc]
                for k in jax.random.split(jax.random.key(33), 3)
            ]

            @jax.jit
            def run_dc(x):
                fx, h, g, s = fused_nuts_run_dc(
                    x,
                    imm_dc,
                    eps,
                    target=dc_target,
                    num_steps=64,
                    max_num_doublings=10,
                    seed=7,
                    num_track=8,
                    budget=1400 * 64 * 4,
                    chunk=256,
                    pack=4,
                    restart_every=16,
                )
                return jnp.stack(
                    [jnp.asarray(g, jnp.float32), timing.checksum((fx, h, s))]
                )

            dc_elapsed, dc_vals = timing.timeit_pull(
                run_dc, [(p,) for p in dc_pos]
            )
            dc_gps = float(dc_vals[0]) / dc_elapsed

            algo = blackjax_tpu.nuts(target.logdensity_fn, **parameters)
            states = jax.vmap(algo.init)(dc_pos[0][:, np.argsort(to_dc)])
            keysets = [
                jax.vmap(lambda kk: jax.random.split(kk, n_dc))(
                    jax.random.split(k, 64)
                )
                for k in jax.random.split(jax.random.key(34), 3)
            ]
            run_x_impl = build_fused_many_steps(
                target.logdensity_fn,
                eps,
                parameters["inverse_mass_matrix"],
                num_steps=64,
                max_num_doublings=10,
                track_fn=lambda s: s.position[:8],
                oversubscription=4,
                unroll=4,
            )

            @jax.jit
            def run_x(keys, states):
                final, h, g = run_x_impl(keys, states)
                return jnp.stack(
                    [jnp.asarray(g, jnp.float32), timing.checksum((final, h))]
                )

            x_elapsed, x_vals = timing.timeit_pull(
                run_x, [(ks, states) for ks in keysets]
            )
            runner_gps = float(x_vals[0]) / x_elapsed
            extras = {
                "pallas_dc_grads_per_sec": round(dc_gps, 1),
                "runner_grads_per_sec": round(runner_gps, 1),
                "pallas_dc_vs_runner": round(dc_gps / runner_gps, 2),
            }
        except Exception as exc:  # pragma: no cover
            print(f"horseshoe dc extras failed: {exc}", file=sys.stderr)

    def ref():
        blackjax = _reference()
        return measure(lambda p: blackjax.nuts(target.logdensity_fn, **p))

    return {
        "value": ours,
        "unit": "min-ESS/sec (horseshoe d=404)",
        "engine": engine,
        **extras,
    }, ref


def config_e2e_flagship():
    """BASELINE.md's north-star pipeline END-TO-END: warmup + adapted-metric
    sampling at 4,096 chains on the 100-dim hierarchical posterior, timed
    as what a user pays — TOTAL wall seconds (warmup + sampling) under
    sampling-phase min-ESS.

    OUR side: multi-chain staged warmup (4,096 vmapped chains, shared
    step size, ensemble welford_diag metric) then the continuous runner
    with the adapted parameters; on TPU the dc Pallas machine also runs
    (diag metric: exactly what the warmup produced) and the better engine
    is reported. REFERENCE side: its canonical pipeline — single-chain
    ``window_adaptation`` (``blackjax/adaptation/window_adaptation.py:296``)
    then scan-of-vmapped NUTS at the same chain count. ESS measured with
    OUR diagnostics on the first 8 coordinates for both (the flagship
    exchangeability argument, ``bench.py:90-96``).
    """
    from blackjax_tpu.models.targets import hierarchical_gaussian

    target = hierarchical_gaussian(100)
    dim = 100
    num_chains, num_steps, num_warmup = (4096, 256, 400) if ON_TPU else (64, 64, 200)
    max_doublings, k_track = 8, 8
    key = jax.random.key(37)
    warm_key, sample_key, pos_key = jax.random.split(key, 3)
    positions = 0.5 * jax.random.normal(pos_key, (num_chains, dim))

    def _ess(hist_cs_k, elapsed):  # (chains, steps, k)
        return _min_ess_per_sec(hist_cs_k, elapsed)

    # ---- ours: staged multi-chain warmup -> best engine ------------------
    import blackjax_tpu
    from blackjax_tpu.adaptation.staged_adaptation import staged_adaptation
    from blackjax_tpu.mcmc import nuts as nuts_mod
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    # warm up on a SUBSET of chains and broadcast (ε, M⁻¹) to the full
    # ensemble: pooled Welford over 256 chains × 400 steps is ~100k draws
    # for a d=100 diagonal metric — adaptation quality is not the binding
    # constraint, warmup wall time is (it dominated the 4,096-chain e2e)
    n_warm_chains = min(256, num_chains)
    warm_positions = positions[:n_warm_chains]
    warmup = staged_adaptation(
        nuts_mod,
        target.logdensity_fn,
        n_chains=n_warm_chains,
        max_num_doublings=max_doublings,
    )

    def run_warmup(k):
        res, _ = warmup.run(k, warm_positions, num_warmup)
        return res

    res = run_warmup(warm_key)  # compile + the canonical parameters
    jax.block_until_ready(jax.tree.leaves(res.state)[0])

    @jax.jit
    def run_warmup_timed(k):
        r = run_warmup(k)
        return timing.checksum((r.state, r.parameters))

    our_warm_elapsed, _ = timing.timeit_pull(
        run_warmup_timed,
        [(jax.random.fold_in(warm_key, i),) for i in range(1, 4)],
    )
    step_size = float(res.parameters["step_size"])
    imm = jnp.asarray(res.parameters["inverse_mass_matrix"])

    algo = blackjax_tpu.nuts(
        target.logdensity_fn,
        step_size=step_size,
        inverse_mass_matrix=imm,
        max_num_doublings=max_doublings,
    )
    states = jax.vmap(algo.init)(positions)
    key_sets = [
        jax.random.split(k, (num_steps, num_chains))
        for k in jax.random.split(sample_key, 4)
    ]
    oversub = 4 if (ON_TPU and num_chains % 4 == 0) else 1
    run_fused = jax.jit(
        build_fused_many_steps(
            target.logdensity_fn,
            step_size,
            imm,
            num_steps=num_steps,
            max_num_doublings=max_doublings,
            track_fn=lambda s: s.position[:k_track],
            oversubscription=oversub,
            unroll=4 if ON_TPU else 1,
        )
    )
    fused_elapsed = _timeit(run_fused, [(ks, states) for ks in key_sets])
    _, fhist, _ = run_fused(key_sets[0], states)
    ours = _ess(np.asarray(fhist), fused_elapsed + our_warm_elapsed)
    engine = "staged-warmup+continuous-runner"

    if ON_TPU:
        try:
            from blackjax_tpu.ops.fused_nuts_dc import (
                fused_nuts_run_dc,
                make_hierarchical_target_dc,
            )

            dc_target = make_hierarchical_target_dc(dim)
            run_dc = jax.jit(
                lambda x: fused_nuts_run_dc(
                    x,
                    imm,
                    step_size,
                    target=dc_target,
                    num_steps=num_steps,
                    max_num_doublings=max_doublings,
                    seed=7,
                    num_track=k_track,
                    tile_chains=128,
                    budget=96 * num_steps * 16,
                    chunk=256,
                    pack=16,
                    restart_every=16,
                )
            )
            pos_variants = [
                (0.5 * jax.random.normal(k, (num_chains, dim)),)
                for k in jax.random.split(pos_key, 4)
            ]
            dc_elapsed = _timeit(run_dc, pos_variants)
            _, dhist, _, dsteps = run_dc(positions)
            jax.block_until_ready(dhist)
            if int(np.min(np.asarray(dsteps))) >= num_steps:
                dc_val = _ess(np.asarray(dhist), dc_elapsed + our_warm_elapsed)
                if dc_val > ours:
                    ours, engine = dc_val, "staged-warmup+pallas-dc"
        except Exception as exc:  # pragma: no cover
            print(f"e2e dc engine failed: {exc}", file=sys.stderr)

    def ref():
        blackjax = _reference()

        def ref_warmup(k):
            wa = blackjax.window_adaptation(
                blackjax.nuts,
                target.logdensity_fn,
                max_num_doublings=max_doublings,
            )
            (state, parameters), _ = wa.run(k, jnp.zeros(dim), num_warmup)
            return parameters

        parameters = ref_warmup(warm_key)  # compile + canonical parameters
        jax.block_until_ready(parameters["step_size"])

        @jax.jit
        def ref_warmup_timed(k):
            return timing.checksum(ref_warmup(k))

        ref_warm_elapsed, _ = timing.timeit_pull(
            ref_warmup_timed,
            [(jax.random.fold_in(warm_key, i),) for i in range(1, 4)],
        )

        # the reference returns extra_parameters (incl. max_num_doublings)
        # inside `parameters`
        ref_algo = blackjax.nuts(target.logdensity_fn, **parameters)
        ref_states = jax.vmap(ref_algo.init)(positions)

        @jax.jit
        def run(states, keys):
            def one(states, ks):
                states, _ = jax.vmap(ref_algo.step)(ks, states)
                return states, states.position[:, :k_track]

            return jax.lax.scan(one, states, keys)

        elapsed = _timeit(run, [(ref_states, ks) for ks in key_sets])
        _, hist = run(ref_states, key_sets[0])  # (steps, chains, k)
        return _ess(
            np.asarray(hist).swapaxes(0, 1), elapsed + ref_warm_elapsed
        )

    return {
        "value": ours,
        "unit": "min-ESS/sec incl. warmup",
        "engine": engine,
        "warmup_sec": round(our_warm_elapsed, 3),
    }, ref


CONFIGS = {
    "hmc": config_hmc,
    "e2e_flagship": config_e2e_flagship,
    "nuts_8schools": config_nuts_8schools,
    "sgld": config_sgld,
    "sgld_chains": config_sgld_chains,
    "smc": config_smc,
    "cross_chain": config_cross_chain,
    "meads": config_meads,
    "horseshoe": config_horseshoe,
}

# bump a config's version when its measurement protocol changes (invalidates
# the cached reference baseline for just that config)
# bump a config's version whenever its protocol or workload size changes:
# the reference-side baseline cache key includes it, so stale baselines
# measured under an older protocol can never pair with a new our-side run
CONFIG_VERSIONS = {
    "sgld": "v5",
    "hmc": "v6",
    "sgld_chains": "v6",
    "cross_chain": "v6",
    "meads": "v6",
    "e2e_flagship": "v6",
    "nuts_8schools": "v5",
    "smc": "v5",
    "horseshoe": "v5",
}


def run_tracked(cache: dict, cache_write, device_kind: str, names=None):
    """Measure every tracked config; reference sides are cached per device.
    Returns {name: {value, unit, vs_baseline, baseline}}."""
    out = {}
    for name, config in CONFIGS.items():
        if names and name not in names:
            continue
        try:
            result, ref_fn = config()
        except Exception as exc:  # pragma: no cover
            print(f"tracked config {name} failed: {exc}", file=sys.stderr)
            continue
        # best-of-N timing on both sides (same harness for ours and ref).
        # The reference is re-measured IN-RUN every time: ratios against a
        # baseline cached under different host/tunnel load drift by tens of
        # percent (observed 0.73x-1.03x on identical compiled programs);
        # the persistent XLA compile cache keeps the re-measure cheap. The
        # cached value is only the fallback when the in-run measure fails.
        cache_key = f"{device_kind}|tracked_{name}|{CONFIG_VERSIONS.get(name, 'v3')}"
        try:
            baseline = ref_fn()
            cache[cache_key] = baseline
            cache_write(cache)
        except Exception as exc:  # pragma: no cover
            print(f"tracked baseline {name} failed: {exc}", file=sys.stderr)
            baseline = cache.get(cache_key)
        result["value"] = round(float(result["value"]), 4)
        result["vs_baseline"] = (
            round(result["value"] / baseline, 3) if baseline else None
        )
        result["baseline"] = round(float(baseline), 4) if baseline else None
        out[name] = result
    return out


if __name__ == "__main__":
    names = sys.argv[1:] or None
    cache = {}
    results = run_tracked(
        cache, lambda c: None, jax.devices()[0].device_kind, names
    )
    print(json.dumps(results, indent=2))
