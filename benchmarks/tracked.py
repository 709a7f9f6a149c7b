"""The non-flagship tracked configs from BASELINE.md, each measured against
the live reference (stock BlackJAX imported from /root/reference) on the
same device.

Called by ``bench.py`` (appended to the one-line JSON under ``"tracked"``);
also runnable directly: ``python -m benchmarks.tracked``.

Comparability notes per config:

- ``hmc`` / ``sgld``: fixed integration work per transition on both sides,
  so transitions/sec (resp. updates/sec) is the honest metric.
- ``nuts_8schools`` / ``horseshoe``: both sides warm up with their own
  window adaptation on one chain, then sample the SAME chain count (512 —
  v6; 64 chains measured the dispatch harness, not the sampler); metric is
  min-ESS/sec measured with OUR diagnostics for both, and our side reports
  its best engine (scan / continuous runner / dc Pallas machine).
- ``smc``: full adaptive-tempering run (prior -> posterior) at 16k
  particles; metric is 1/wall-seconds, vs_baseline the wall-time ratio.
  v6: our side runs the packaged device-resident driver (one dispatch per
  run); the reference side its canonical host-paced loop — per-step
  compute parity and a hand-rolled reference while_loop are reported as
  extras for decomposition.
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


def _per_dim_ess_device(hist):
    """hist: (chains, steps, d) ON-DEVICE -> np (d,) per-dim ESS.

    The ESS estimator (:func:`blackjax_tpu.diagnostics
    .effective_sample_size`) is pure ``jnp``, so it runs where the history
    lives — only ``d`` floats cross the device tunnel, not the history
    itself (a 512-chain x 400-step x 404-dim horseshoe history is ~330 MB;
    pulling it to the host dominates the whole config's wall time)."""
    from blackjax_tpu.diagnostics import effective_sample_size

    ess = jax.jit(
        lambda h: effective_sample_size(h, chain_axis=0, sample_axis=1)
    )(jnp.asarray(hist))
    return np.asarray(ess)


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
    logdensity_fn,
    parameters,
    positions,
    sample_key,
    num_steps,
    dc=None,
    engines=("scan", "runner"),
):
    """Measure OUR NUTS sampling with every available engine — the
    per-step vmapped scan, the continuous runner
    (:func:`mcmc.nuts.build_fused_many_steps`, bit-identical samples, no
    per-step lockstep barrier), and (when ``dc`` is given, TPU only) the
    in-kernel Pallas machine — and return ``(min_ess_per_sec,
    engine_name, extras)`` for the best one.

    The reference side keeps its canonical scan-of-vmap (it has no other
    engine); our side reports the best engine per VERDICT r3 #1.

    ``dc`` is a dict spec for the Pallas contender (see
    :func:`_measure_nuts_dc`): ``target`` (a
    :class:`~blackjax_tpu.ops.fused_nuts_dc.TargetKernelDC`), ``to_dc``
    (model->kernel coordinate permutation), ``pack``, ``budget_factor``
    (leaf budget per transition), and optionally ``num_track`` — when
    smaller than ``d``, the tracked subset is the ``num_track``
    slowest-mixing coordinates RANKED ON THE FULL-HISTORY ENGINE's per-dim
    ESS (same posterior, same adapted parameters), so min-over-tracked
    measures min-over-all; the ranking margin (how far the subset boundary
    sits above the minimum) is reported so the honesty of the subset is
    auditable.
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
    scan_per_dim = _per_dim_ess_device(jnp.swapaxes(hist, 0, 1))
    scan_ess = float(np.min(scan_per_dim) / scan_elapsed)

    # engine B: the continuous runner (same keys per (step, chain) =>
    # bit-identical samples; chains flow through transitions barrier-free).
    # Callers may exclude it (engines=("scan",)) with a measured write-down
    # — on the matmul-class horseshoe its HBM-resident machine carry makes
    # it ~15-20x slower than the scan (r5: 31 s vs 1.5 s at 512 chains),
    # so timing a known-losing engine only burns benchmark wall time.
    best, engine = scan_ess, "scan-of-vmap"
    fused_per_dim = None
    if "runner" in engines:
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
        fused_per_dim = _per_dim_ess_device(fhist)
        fused_ess = float(np.min(fused_per_dim) / fused_elapsed)
        if fused_ess >= scan_ess:
            best, engine = fused_ess, "continuous-runner"
    extras = {}

    # engine C: the in-kernel Pallas machine (registered analytic targets).
    # It may HEAD the entry only when its ESS estimand matches the XLA
    # engines' (num_track >= d: min-over-ALL-dims on an equal-length
    # series). A subset-tracked run reports as extras only: ESS/grad is
    # equal across engines BY DESIGN, so with grads/s at parity a higher
    # subset-min "ESS/sec" can only be estimator truncation/subset bias —
    # measured on the horseshoe: dc 21.9M grads/s vs scan 20.7M (parity)
    # but subset-min 2.2x scan's all-dims min. Reporting that as a win
    # would be a measurement artifact, not a speedup.
    if dc is not None and ON_TPU:
        try:
            rate, info = _measure_nuts_dc(
                dc,
                parameters,
                positions,
                num_steps,
                # rank on the winning full-history engine's per-dim ESS
                scan_per_dim if engine == "scan-of-vmap" else fused_per_dim,
            )
            extras.update(info)
            full_estimand = int(dc.get("num_track", d)) >= d and int(
                dc.get("num_steps", num_steps)
            ) >= num_steps
            if rate > best and full_estimand:
                best, engine = rate, "pallas-dc"
        except Exception as exc:  # pragma: no cover — robustness
            print(f"dc engine contender failed: {exc}", file=sys.stderr)
    return best, engine, extras


def _measure_nuts_dc(dc, parameters, positions, num_steps, full_per_dim_ess):
    """Time the in-kernel dc Pallas NUTS machine and return
    ``(min_ess_per_sec, info)``. ESS is measured on its OWN history over
    the tracked coordinate subset (protocol of ``bench.py``'s flagship);
    the subset is the full coordinate set when ``num_track >= d``,
    otherwise the ``num_track`` slowest-mixing coordinates ranked by
    ``full_per_dim_ess`` (measured on the full-history XLA engine at
    identical (step size, metric) on the same posterior)."""
    from blackjax_tpu.ops.fused_nuts_dc import fused_nuts_run_dc

    num_chains, d = positions.shape
    num_steps = int(dc.get("num_steps", num_steps))  # ESS-precision budget
    imm = jnp.asarray(parameters["inverse_mass_matrix"])
    if imm.ndim != 1:
        raise ValueError("dc contender expects a diagonal metric here")
    to_dc = np.asarray(dc["to_dc"])
    from_dc = np.argsort(to_dc)
    num_track = int(dc.get("num_track", d))
    if num_track >= d:
        num_track = d
        track_rows = None  # rows 0..d-1: every real coordinate
        subset_margin = None
    else:
        order = np.argsort(full_per_dim_ess)  # model coords, slowest first
        tracked_model = order[:num_track]
        # dc row of model coordinate i is from_dc[i]
        track_rows = tuple(int(from_dc[i]) for i in tracked_model)
        # honesty margin: ESS at the subset boundary over the global min —
        # the dc stream's own argmin can only fall outside the subset if
        # per-dim ESS noise exceeds this ratio
        subset_margin = float(
            full_per_dim_ess[order[num_track - 1]]
            / max(full_per_dim_ess[order[0]], 1e-12)
        )

    pack = int(dc.get("pack", 4))
    budget = int(dc.get("budget_factor", 128)) * num_steps * pack
    eps = float(parameters["step_size"])
    imm_dc = imm[to_dc]

    def run_impl(x):
        return fused_nuts_run_dc(
            x,
            imm_dc,
            eps,
            target=dc["target"],
            num_steps=num_steps,
            max_num_doublings=int(dc.get("max_num_doublings", 10)),
            seed=int(dc.get("seed", 7)),
            num_track=num_track,
            track_rows=track_rows,
            tile_chains=128,
            budget=budget,
            chunk=int(dc.get("chunk", 256)),
            pack=pack,
            restart_every=int(dc.get("restart_every", 16)),
        )

    x0 = jnp.asarray(positions)[:, to_dc]
    # compile + the canonical stream for the ESS estimate (untimed)
    fx, hist, grads, steps = jax.jit(run_impl)(x0)
    jax.block_until_ready(hist)
    completed = int(np.min(np.asarray(steps)))
    if completed < num_steps:
        raise RuntimeError(
            f"dc budget exhausted ({completed}/{num_steps} transitions)"
        )

    @jax.jit
    def run_timed(x):
        fx, h, g, s = run_impl(x)
        return jnp.stack(
            [
                jnp.asarray(g, jnp.float32),
                jnp.min(s).astype(jnp.float32),
                timing.checksum((fx, h)),
            ]
        )

    # distinct position jitters per timed dispatch (the runtime
    # result-caches identical dispatches); the jitter is a different chain
    # of the same posterior, so the work distribution is unchanged
    variants = [
        (x0 + 1e-3 * jax.random.normal(k, x0.shape),)
        for k in jax.random.split(jax.random.key(101), 4)
    ]
    elapsed, vals = timing.timeit_pull(run_timed, variants)
    if int(vals[1]) < num_steps:
        raise RuntimeError("dc budget exhausted in a timed variant")
    ess = _per_dim_ess_device(hist)  # (num_track,)
    rate = float(np.min(ess)) / elapsed
    # name the estimand: min-over-ALL-dims only when every coordinate is
    # tracked; a subset min is labeled as such so it can't be mistaken for
    # the headline quantity
    key = (
        "pallas_dc_ess_per_sec"
        if num_track >= d
        else "pallas_dc_tracked_min_ess_per_sec"
    )
    info = {
        key: round(rate, 3),
        "pallas_dc_grads_per_sec": round(float(vals[0]) / elapsed, 1),
        "pallas_dc_num_track": num_track,
    }
    if subset_margin is not None:
        info["pallas_dc_subset_margin"] = round(subset_margin, 2)
    return rate, info


# --------------------------------------------------------------------------
# 2. NUTS + window adaptation — eight schools, 64 chains
# --------------------------------------------------------------------------


def config_nuts_8schools():
    """NUTS + Stan window adaptation on non-centered eight schools (d=10).

    Both sides warm up with their own single-chain window adaptation, then
    sample 512 vmapped chains (v6: was 64 — at d=10 the scan engine is
    dispatch-latency-bound well past 512 chains, so small-chain counts
    measure the harness, not the sampler; both sides run the SAME count).
    Our side reports its best engine; the dc Pallas contender tracks ALL
    10 coordinates, so its min-ESS is min-over-all-dims — the same
    estimand as the XLA engines', on its own documented-equivalent RNG
    stream."""
    from blackjax_tpu.models.targets import eight_schools_noncentered

    target = eight_schools_noncentered()
    num_chains, num_steps, num_warmup = (512, 800, 400) if ON_TPU else (16, 200, 200)
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
    from blackjax_tpu.ops.targets_dc import (
        eight_schools_dc_perm,
        make_eight_schools_target_dc,
    )

    dc_spec = {
        "target": make_eight_schools_target_dc(),
        "to_dc": eight_schools_dc_perm()[0],
        "num_track": 10,  # = d: full-coordinate history, min-over-all ESS
        "pack": 4,
        "budget_factor": 160,
    }
    ours, engine, extras = _measure_nuts_best_engine(
        target.logdensity_fn,
        res.parameters,
        positions,
        sample_key,
        num_steps,
        dc=dc_spec,
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

    return {"value": ours, "unit": "min-ESS/sec", "engine": engine, **extras}, ref


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
    """Adaptive-tempered SMC (prior -> posterior, 16k particles, MALA
    rejuvenation), timed END-TO-END as what a user pays for a full run.

    OUR side runs the packaged device-resident driver
    (:func:`blackjax_tpu.parallel.smc.run_adaptive_tempered_smc` on a
    1-device mesh): the whole ``while lambda < 1`` loop compiles into ONE
    program, so control crosses the host<->device boundary once per run.
    The REFERENCE side runs its canonical pattern — a host-paced Python
    loop around ``algo.step`` that pulls ``tempering_param`` every step
    (its docs' inference loop; it ships no full-run driver). Per-step
    COMPUTE is at proven parity (v5 measured 0.994x with both sides
    host-paced — that number is reported as ``ours_host_paced`` for
    decomposition), so the v6 gain is the driver, not the kernel; for
    complete transparency ``ref_while_loop`` reports the reference stepped
    inside a hand-rolled ``lax.while_loop`` harness — the spelling a
    stock-BlackJAX user COULD write by hand but the library neither ships
    nor tests."""
    d, n_particles = 10, 16384 if ON_TPU else 2048
    obs = jnp.linspace(-1.0, 1.0, d)
    logprior_fn = lambda x: -0.5 * jnp.sum(x**2) / 9.0
    loglikelihood_fn = lambda x: -0.5 * jnp.sum((x - obs) ** 2)
    key = jax.random.key(17)
    init_particles = 3.0 * jax.random.normal(key, (n_particles, d))

    def measure_host(pkg, mala_mod, resampling_mod):
        """Host-paced loop: one dispatch + one scalar pull per tempering
        step (the reference's canonical spelling, used verbatim for the
        v5 parity number)."""
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
        # best-of-3 with DISTINCT keys (identical dispatches are
        # result-cached by the device runtime — see _timeit)
        elapsed = float("inf")
        for rk in jax.random.split(jax.random.key(18), 3):
            t0 = time.perf_counter()
            s, i = full_run(rk)
            elapsed = min(elapsed, time.perf_counter() - t0)
        return 1.0 / elapsed, elapsed, i

    import blackjax_tpu
    from blackjax_tpu.mcmc import mala as our_mala
    from blackjax_tpu.parallel.smc import run_adaptive_tempered_smc
    from blackjax_tpu.smc import resampling as our_resampling

    # ---- ours: the device-resident full-run driver -----------------------
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:1]), ("particles",))
    mala_kernel = our_mala.build_kernel()  # built ONCE: the driver's
    # program cache keys on function identity

    def run_device(k):
        res = run_adaptive_tempered_smc(
            k,
            init_particles,
            logprior_fn,
            loglikelihood_fn,
            mala_kernel,
            our_mala.init,
            {"step_size": jnp.full((1,), 0.1)},
            mesh,
            target_ess=0.5,
            num_mcmc_steps=5,
            max_steps=50,
        )
        # scalar checksum pull forces completion (the tunneled runtime can
        # return from block_until_ready before execution finishes)
        checksum = float(jnp.sum(res.particles)) + float(res.tempering_param)
        return res, checksum

    res, _ = run_device(jax.random.key(18))  # compile + correctness
    assert float(res.tempering_param) == 1.0
    our_steps = int(res.num_steps)
    our_elapsed = float("inf")
    for rk in jax.random.split(jax.random.key(19), 3):
        t0 = time.perf_counter()
        res, _ = run_device(rk)
        our_elapsed = min(our_elapsed, time.perf_counter() - t0)
    ours = 1.0 / our_elapsed

    # decomposition extra: ours under the SAME host-paced harness as the
    # reference (the v5 protocol) — isolates driver gain from kernel parity
    from blackjax_tpu.smc import resampling as _ours_res

    ours_host, _, _ = measure_host(blackjax_tpu, our_mala, _ours_res)

    def ref():
        blackjax = _reference()
        import blackjax.mcmc.mala as ref_mala
        import blackjax.smc.resampling as ref_resampling

        val, _, _ = measure_host(blackjax, ref_mala, ref_resampling)
        return val

    extras = {"ours_host_paced": round(ours_host, 4)}
    # transparency: the reference stepped inside a hand-rolled
    # lax.while_loop (not a reference API; what a user could write)
    try:
        blackjax = _reference()
        import blackjax.mcmc.mala as ref_mala
        import blackjax.smc.resampling as ref_resampling

        ref_algo = blackjax.adaptive_tempered_smc(
            logprior_fn,
            loglikelihood_fn,
            ref_mala.build_kernel(),
            ref_mala.init,
            {"step_size": jnp.full((1,), 0.1)},
            ref_resampling.systematic,
            target_ess=0.5,
            num_mcmc_steps=5,
        )

        @jax.jit
        def ref_full(k):
            s0 = ref_algo.init(init_particles)

            def cond(c):
                s, _, i = c
                return (s.tempering_param < 1.0) & (i < 50)

            def body(c):
                s, kk, i = c
                kk, sk = jax.random.split(kk)
                s, _ = ref_algo.step(sk, s)
                return s, kk, i + 1

            s, _, n = jax.lax.while_loop(
                cond, body, (s0, k, jnp.asarray(0))
            )
            return s, n

        s, _ = ref_full(jax.random.key(18))
        float(jnp.sum(s.particles))  # compile + completion
        rw_elapsed = float("inf")
        for rk in jax.random.split(jax.random.key(19), 3):
            t0 = time.perf_counter()
            s, _ = ref_full(rk)
            float(jnp.sum(s.particles)) + float(s.tempering_param)
            rw_elapsed = min(rw_elapsed, time.perf_counter() - t0)
        extras["ref_while_loop"] = round(1.0 / rw_elapsed, 4)
    except Exception as exc:  # pragma: no cover — transparency only
        extras["ref_while_loop"] = f"failed: {exc}"

    return {
        "value": ours,
        "unit": "runs/sec (full tempering)",
        "elapsed_sec": round(our_elapsed, 4),
        "tempering_steps": our_steps,
        "engine": "device-resident driver",
        **extras,
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
    benchmark posterior, ``tests/test_benchmarks.py:65``; its flagship perf
    artifact, ``docs/examples/speed_up_guide.md:193``). Warmup runs ONCE
    (ours) and the adapted parameters are shared by both sides, so the
    measured quantity is pure NUTS sampling min-ESS/sec on a realistic
    correlated posterior.

    v6 protocol: BOTH sides sample 512 chains x 128 steps (was 64 x 400) —
    at 64 chains the chip is occupancy-bound and the config measures
    dispatch latency, not the sampler (measured r5: our scan does 2.5x the
    chain-steps in LESS wall time at 512 than at 64; 2048 is past our
    throughput peak and crashes the reference side). Our side times the
    scan engine only: the continuous runner was measured 15-20x slower on
    this matmul-class posterior (its machine carry is HBM-resident; 31 s vs
    1.5 s at 512 chains, r5 write-down in ARCHITECTURE.md), and the dc
    Pallas machine ties the scan on grads/s (19.5M vs 20.7M) while tracking
    only a coordinate subset — both are reported as extras, neither can
    honestly head the entry."""
    from blackjax_tpu.models.targets import finnish_horseshoe

    target = finnish_horseshoe()  # N=100, M=200, d=404
    d = target.dim
    num_chains, num_steps, num_warmup = (512, 128, 600) if ON_TPU else (8, 80, 200)
    key = jax.random.key(31)
    warm_key, sample_key, pos_key = jax.random.split(key, 3)
    positions = 0.05 * jax.random.normal(pos_key, (num_chains, d))

    from blackjax_tpu.adaptation.window_adaptation import window_adaptation
    from blackjax_tpu.mcmc import nuts as nuts_mod

    results, _ = window_adaptation(nuts_mod, target.logdensity_fn).run(
        warm_key, jnp.zeros(d), num_warmup
    )
    parameters = results.parameters

    dc_spec = None
    if ON_TPU:
        from blackjax_tpu.ops.targets_dc import (
            horseshoe_dc_perm,
            make_finnish_horseshoe_target_dc,
        )

        dc_spec = {
            "target": make_finnish_horseshoe_target_dc(),
            "to_dc": horseshoe_dc_perm(200)[0],
            "num_track": 32,  # slowest 32 of 404, ranked on the scan history
            "pack": 4,
            "budget_factor": 1600,
            "num_steps": 64,
        }

    ours, engine, extras = _measure_nuts_best_engine(
        target.logdensity_fn,
        parameters,
        positions,
        sample_key,
        num_steps,
        dc=dc_spec,
        engines=("scan",),
    )

    def ref():
        blackjax = _reference()
        algo = blackjax.nuts(target.logdensity_fn, **parameters)
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
        per_dim = _per_dim_ess_device(jnp.swapaxes(hist, 0, 1))
        return float(np.min(per_dim) / elapsed)

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
    "nuts_8schools": "v6",
    "smc": "v6",
    "horseshoe": "v6",
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
