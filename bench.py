"""Benchmark harness: NUTS ESS/sec/chip at many chains on the 100-dim
hierarchical posterior (the BASELINE.json north-star config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

``vs_baseline`` compares against *vmapped stock BlackJAX* (imported from
/root/reference) run with the identical configuration on the same device;
the baseline measurement is cached per device kind in
``.bench_baseline_cache.json`` so repeated runs don't pay for it twice.
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
from benchmarks import timing  # noqa: E402 — axon-safe timing protocol
# persistent compilation cache: repeat runs skip the multi-minute XLA builds
try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
except Exception:
    pass
CACHE_PATH = os.path.join(REPO, ".bench_baseline_cache.json")

# honor JAX_PLATFORMS for CPU smoke runs even when the environment's
# sitecustomize pinned a TPU platform at interpreter startup (the env var
# alone does not override that; the config call before first backend use
# does — same pattern as examples/)
if os.environ.get("JAX_PLATFORMS"):
    try:
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    except Exception:
        pass


def _probe_backend(timeout_s: int = 180) -> None:
    """Fail FAST if the device backend is unresponsive instead of hanging
    the caller forever.

    Observed failure mode (2026-08-17): the axon TPU tunnel can go down for
    hours; any process then blocks indefinitely inside backend init /
    the first device op at ~0% CPU. The first backend touch runs on a
    watchdog thread; on timeout we print an explicit diagnosis and exit
    nonzero so the driver records the cause rather than a silent hang.
    """
    import threading

    done = threading.Event()
    failure = []

    def probe():
        try:
            jax.block_until_ready(jnp.ones((8, 8)) @ jnp.ones((8, 8)))
        except Exception as exc:  # pragma: no cover
            failure.append(repr(exc))
        done.set()

    thread = threading.Thread(target=probe, daemon=True)
    thread.start()
    if not done.wait(timeout_s):
        msg = (
            f"device backend unresponsive after {timeout_s}s "
            "(TPU tunnel down?); refusing to hang"
        )
        print(msg, file=sys.stderr, flush=True)
        print(json.dumps({"metric": "bench-aborted", "error": msg}), flush=True)
        os._exit(2)
    if failure:
        print(f"backend probe failed: {failure[0]}", file=sys.stderr, flush=True)
        print(
            json.dumps({"metric": "bench-aborted", "error": failure[0]}), flush=True
        )
        os._exit(2)


_probe_backend()

# benchmark configuration (scaled down automatically on CPU)
DIM = 100
ON_TPU = jax.devices()[0].platform != "cpu"
NUM_CHAINS = 4096 if ON_TPU else 64
NUM_STEPS = 256 if ON_TPU else 32
WARMUP_STEPS = 400
STEP_SIZE_FALLBACK = 0.25
# ESS measured on the first k coordinates. Justification for k=8 < d: the
# hierarchical target is exchangeable in theta_1..theta_{d-1} (identical
# marginals and identical per-coordinate mixing by symmetry), so min-ESS
# over all d dims is min(ESS(log_tau), min over 7 iid-distributed theta ESS
# estimates) — log_tau (tracked) is the slow coordinate and sets the min;
# tracking more thetas only adds estimator noise while multiplying history
# HBM traffic by d/k.
TRACKED_DIMS = 8
MAX_DOUBLINGS = 8
# slot oversubscription for the continuous runner: m=4 measured best on v5e
# (16.97M vs 14.37M grads/s at m=1; samples bit-identical either way)
OVERSUB = int(os.environ.get("BENCH_OVERSUB", "4" if ON_TPU else "1"))
# while-loop unroll for the continuous runner (leaves per loop iteration;
# amortizes the loop's fixed per-iteration cost, bit-identical samples)
UNROLL = int(os.environ.get("BENCH_UNROLL", "4" if ON_TPU else "1"))
# gate the restart machinery (key gather + momentum draws for all slots) to
# every r-th unrolled body; chains park <= r-1 leaves, samples unchanged
RESTART_EVERY = int(os.environ.get("BENCH_RESTART_EVERY", "1"))
# dc-kernel slot packing: logical chains per physical lane (per-chain
# outputs identical to pack=1; measured 28.2 -> 43.2M grads/s at 16 on v5e)
PACK = int(os.environ.get("BENCH_PACK", "16" if ON_TPU else "2"))
# dc-kernel restart gating: run the threefry+refresh+history block every
# r-th leaf only (draws are keyed on (chain, step) so outputs are bitwise
# identical; chains park <= r-1 leaves). pack absorbs the parking:
# 43 -> 126M grads/s at pack=16, r=16 on v5e
DC_RESTART_EVERY = int(os.environ.get("BENCH_DC_RESTART", "16" if ON_TPU else "2"))


def hierarchical_logdensity(x):
    log_tau = x[..., 0]
    theta = x[..., 1:]
    lp_tau = -0.5 * log_tau**2
    lp_theta = -0.5 * jnp.sum(theta**2, axis=-1) * jnp.exp(-log_tau) - 0.5 * (
        DIM - 1
    ) * log_tau
    return lp_tau + lp_theta


def _measure(step_fn, init_states, rng_key, num_chains, num_steps):
    """Scan `num_steps` vmapped kernel applications; return
    (elapsed_seconds, positions (steps, chains, k), total_grad_evals)."""

    def _run(key, states):
        def one(states, key):
            keys = jax.random.split(key, num_chains)
            states, infos = step_fn(keys, states)
            return states, (states.position[:, :TRACKED_DIMS], infos_steps(infos))

        keys = jax.random.split(key, num_steps)
        final, (hist, nsteps) = jax.lax.scan(one, states, keys)
        return final, hist, nsteps

    def infos_steps(infos):
        return jnp.sum(infos.num_integration_steps)

    # the canonical (pinned) sample stream for the ESS estimate (untimed)
    _, hist, _ = jax.jit(_run)(rng_key, init_states)
    jax.block_until_ready(hist)

    # timed runs under DISTINCT keys, reduced on device to (grads, checksum)
    # and pulled to host — the axon-safe protocol (benchmarks/timing.py)
    @jax.jit
    def run_timed(key, states):
        final, h, nsteps = _run(key, states)
        return jnp.stack(
            [jnp.sum(nsteps).astype(jnp.float32), timing.checksum((final, h))]
        )

    variants = [
        (jax.random.fold_in(rng_key, i), init_states) for i in range(4)
    ]
    elapsed, vals = timing.timeit_pull(run_timed, variants)
    return elapsed, np.asarray(hist), int(vals[0])


def _ess_per_dim(hist):
    """hist: (steps, chains, k) -> min ESS over the k tracked dims."""
    from blackjax_tpu.diagnostics import effective_sample_size

    x = jnp.asarray(hist).transpose(1, 0, 2)  # (chains, steps, k)
    ess = effective_sample_size(x)
    return float(np.min(np.asarray(ess)))


def _warmup_params(rng_key):
    """Cheap single-chain window adaptation to get (step_size, imm)."""
    import blackjax_tpu
    from blackjax_tpu.adaptation.window_adaptation import window_adaptation
    from blackjax_tpu.mcmc import nuts as nuts_mod

    warmup = window_adaptation(
        nuts_mod, hierarchical_logdensity, max_num_doublings=MAX_DOUBLINGS
    )
    try:
        results, _ = warmup.run(rng_key, jnp.zeros(DIM), WARMUP_STEPS)
        step_size = float(results.parameters["step_size"])
        imm = results.parameters["inverse_mass_matrix"]
        if not np.isfinite(step_size) or step_size <= 0:
            raise ValueError("non-finite step size")
        return step_size, imm
    except Exception as exc:  # pragma: no cover - robustness for the driver
        print(f"warmup failed ({exc}); falling back", file=sys.stderr)
        return STEP_SIZE_FALLBACK, jnp.ones(DIM)


def bench_ours(rng_key, step_size, imm):
    import blackjax_tpu

    algo = blackjax_tpu.nuts(
        hierarchical_logdensity,
        step_size=step_size,
        inverse_mass_matrix=imm,
        max_num_doublings=MAX_DOUBLINGS,
    )
    init_keys = jax.random.split(rng_key, NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (DIM,)))(init_keys)
    states = jax.vmap(algo.init)(positions)
    step_fn = jax.vmap(algo.step)
    return _measure(step_fn, states, rng_key, NUM_CHAINS, NUM_STEPS)


def bench_ours_fused(rng_key, step_size, imm):
    """The continuous runner (production path): bit-identical samples to
    the scan-of-kernel path, but chains flow through transitions without a
    per-step lockstep barrier."""
    import blackjax_tpu
    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    algo = blackjax_tpu.nuts(
        hierarchical_logdensity,
        step_size=step_size,
        inverse_mass_matrix=imm,
        max_num_doublings=MAX_DOUBLINGS,
    )
    init_keys = jax.random.split(rng_key, NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (DIM,)))(init_keys)
    states = jax.vmap(algo.init)(positions)

    # exactly the keys the scan path uses: per step, per chain
    def _keys(key):
        step_keys = jax.random.split(key, NUM_STEPS)
        return jax.vmap(lambda k: jax.random.split(k, NUM_CHAINS))(step_keys)

    run_impl = build_fused_many_steps(
        hierarchical_logdensity,
        step_size,
        imm,
        num_steps=NUM_STEPS,
        max_num_doublings=MAX_DOUBLINGS,
        track_fn=lambda s: s.position[:TRACKED_DIMS],
        oversubscription=OVERSUB if NUM_CHAINS % OVERSUB == 0 else 1,
        unroll=UNROLL,
        restart_every=min(RESTART_EVERY, UNROLL),
    )
    # compile + the pinned stream for the ESS estimate (untimed)
    _, hist, _ = jax.jit(run_impl)(_keys(rng_key), states)
    jax.block_until_ready(hist)

    @jax.jit
    def run_timed(keys, states):
        final, h, grads = run_impl(keys, states)
        return jnp.stack(
            [jnp.asarray(grads, jnp.float32), timing.checksum((final, h))]
        )

    # distinct key sets per timed dispatch (axon result cache); on-device
    # checksum pull (axon early return) — see benchmarks/timing.py
    variants = [
        (_keys(jax.random.fold_in(rng_key, i)), states) for i in range(4)
    ]
    elapsed, vals = timing.timeit_pull(run_timed, variants)
    # hist: (chains, steps, k) -> (steps, chains, k) for _ess_per_dim
    return elapsed, np.asarray(hist).swapaxes(0, 1), int(vals[0])


def bench_ours_pallas(rng_key, step_size, imm):
    """The in-kernel continuous machine (Pallas, transposed (dim, chains)
    layout): the whole NUTS machine VMEM-resident, one leapfrog per
    iteration, inline restarts. Documented statistical equivalence with
    the XLA engine (independent counter-based RNG stream) — see
    ``ops/fused_nuts_dc.py`` and ``tests/ops/test_fused_nuts_dc.py``.
    Returns (elapsed, hist (steps, chains, k), grads, completed_steps)."""
    from blackjax_tpu.ops.fused_nuts_dc import (
        fused_nuts_run_dc,
        make_hierarchical_target_dc,
    )

    target = make_hierarchical_target_dc(DIM)

    def _positions(key):
        init_keys = jax.random.split(key, NUM_CHAINS)
        return 0.5 * jax.vmap(lambda k: jax.random.normal(k, (DIM,)))(init_keys)

    def run_impl(x):
        return fused_nuts_run_dc(
            x,
            jnp.asarray(imm),
            step_size,
            target=target,
            num_steps=NUM_STEPS,
            max_num_doublings=MAX_DOUBLINGS,
            seed=7,
            num_track=TRACKED_DIMS,
            tile_chains=128,
            budget=112 * NUM_STEPS * PACK,
            chunk=256,
            pack=PACK,
            restart_every=DC_RESTART_EVERY,
        )

    # compile + the canonical stream for the ESS estimate (untimed)
    fx, hist, grads, steps = jax.jit(run_impl)(_positions(rng_key))
    jax.block_until_ready(hist)

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

    # distinct init draws per timed dispatch (runtime result cache);
    # on-device checksum pull (early return) — see benchmarks/timing.py
    variants = [
        (_positions(jax.random.fold_in(rng_key, i)),) for i in range(4)
    ]
    elapsed, vals = timing.timeit_pull(run_timed, variants)
    completed = min(int(np.min(np.asarray(steps))), int(vals[1]))
    return elapsed, np.asarray(hist).swapaxes(0, 1), int(vals[0]), completed


def bench_reference(rng_key, step_size, imm):
    sys.path.insert(0, "/root/reference")
    # the reference's generated version module is absent from its source
    # tree; stub it so the package imports
    import types

    version_stub = types.ModuleType("blackjax._version")
    version_stub.__version__ = "reference"
    sys.modules.setdefault("blackjax._version", version_stub)
    import blackjax  # noqa: E501 — stock reference library, vmapped

    algo = blackjax.nuts(
        hierarchical_logdensity,
        step_size=step_size,
        inverse_mass_matrix=jnp.asarray(imm),
        max_num_doublings=MAX_DOUBLINGS,
    )
    init_keys = jax.random.split(rng_key, NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (DIM,)))(init_keys)
    states = jax.vmap(algo.init)(positions)
    step_fn = jax.vmap(algo.step)
    return _measure(step_fn, states, rng_key, NUM_CHAINS, NUM_STEPS)


def main():
    device = jax.devices()[0]
    cfg_key = f"{device.device_kind}|c{NUM_CHAINS}|s{NUM_STEPS}|d{DIM}|v4"
    rng_key = jax.random.key(2026)
    warm_key, run_key = jax.random.split(rng_key)

    step_size, imm = _warmup_params(warm_key)

    # the continuous (fused) runner — the general-purpose production path;
    # bit-identical samples to the per-step kernel scan
    elapsed, hist, grad_evals = bench_ours_fused(run_key, step_size, imm)
    ess = _ess_per_dim(hist)
    runner_ess_per_sec = ess / elapsed
    runner_grads_per_sec = grad_evals / elapsed

    # the in-kernel Pallas machine (registered analytic targets): headline
    # when it wins and completes; statistically equivalent, own RNG stream
    pallas = None
    if ON_TPU and os.environ.get("BENCH_PALLAS", "1") == "1":
        try:
            p_elapsed, p_hist, p_grads, p_done = bench_ours_pallas(
                run_key, step_size, imm
            )
            if p_done >= NUM_STEPS:
                pallas = {
                    "min_ess": _ess_per_dim(p_hist),
                    "elapsed": p_elapsed,
                    "grads": p_grads,
                }
            else:
                print(
                    f"pallas path: budget exhausted ({p_done}/{NUM_STEPS})",
                    file=sys.stderr,
                )
        except Exception as exc:  # pragma: no cover - robustness
            print(f"pallas path failed: {exc}", file=sys.stderr)

    if pallas and pallas["min_ess"] / pallas["elapsed"] > runner_ess_per_sec:
        engine = "pallas-dc"
        ours_ess_per_sec = pallas["min_ess"] / pallas["elapsed"]
        grad_evals_per_sec = pallas["grads"] / pallas["elapsed"]
        headline_ess = pallas["min_ess"]
        headline_elapsed = pallas["elapsed"]
    else:
        engine = "xla-runner"
        ours_ess_per_sec = runner_ess_per_sec
        grad_evals_per_sec = runner_grads_per_sec
        headline_ess = ess
        headline_elapsed = elapsed

    # secondary: the per-step kernel path (same ESS; lockstep per step)
    k_elapsed, _, k_grads = bench_ours(run_key, step_size, imm)
    kernel_ess_per_sec = ess / k_elapsed
    kernel_grads_per_sec = k_grads / k_elapsed

    # --- baseline: vmapped stock BlackJAX ---------------------------------
    # Re-measured EVERY run (the persistent compile cache keeps this to
    # ~2x the reference's sampling time): ratios against a baseline cached
    # from an earlier, differently-loaded session drift by tens of percent
    # with tunnel/host contention. The cache is only the fallback when the
    # in-run reference measurement fails.
    baseline = None
    cache = {}
    if os.path.exists(CACHE_PATH):
        try:
            cache = json.load(open(CACHE_PATH))
        except Exception:
            cache = {}
    try:
        b_elapsed, b_hist, b_grads = bench_reference(run_key, step_size, imm)
        baseline = {
            "ess_per_sec": _ess_per_dim(b_hist) / b_elapsed,
            "grad_evals_per_sec": b_grads / b_elapsed,
            "elapsed": b_elapsed,
        }
        cache[cfg_key] = baseline
        json.dump(cache, open(CACHE_PATH, "w"))
    except Exception as exc:  # pragma: no cover
        print(f"reference baseline failed: {exc}", file=sys.stderr)
        baseline = cache.get(cfg_key)

    vs_baseline = (
        ours_ess_per_sec / baseline["ess_per_sec"] if baseline else float("nan")
    )

    # --- the other four BASELINE.md tracked configs (vs live reference) ----
    tracked = {}
    if os.environ.get("BENCH_TRACKED", "1") == "1":
        try:
            from benchmarks.tracked import run_tracked

            tracked = run_tracked(
                cache,
                lambda c: json.dump(c, open(CACHE_PATH, "w")),
                device.device_kind,
            )
        except Exception as exc:  # pragma: no cover
            print(f"tracked configs failed: {exc}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": f"NUTS min-ESS/sec/chip ({DIM}-dim hierarchical, {NUM_CHAINS} chains)",
                "value": round(ours_ess_per_sec, 3),
                "unit": "ESS/sec",
                "vs_baseline": round(vs_baseline, 3) if baseline else None,
                "engine": engine,
                "grad_evals_per_sec": round(grad_evals_per_sec, 1),
                "runner_ess_per_sec": round(runner_ess_per_sec, 3),
                "runner_grads_per_sec": round(runner_grads_per_sec, 1),
                "runner_min_ess": round(ess, 1),
                "pallas_min_ess": (
                    round(pallas["min_ess"], 1) if pallas else None
                ),
                "kernel_path_ess_per_sec": round(kernel_ess_per_sec, 3),
                "kernel_path_grads_per_sec": round(kernel_grads_per_sec, 1),
                "min_ess": round(headline_ess, 1),
                "elapsed_sec": round(headline_elapsed, 3),
                "step_size": round(step_size, 5),
                "device": str(device.device_kind),
                "baseline_ess_per_sec": (
                    round(baseline["ess_per_sec"], 3) if baseline else None
                ),
                "tracked": tracked,
            }
        )
    )


if __name__ == "__main__":
    main()
