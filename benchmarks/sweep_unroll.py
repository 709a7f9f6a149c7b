"""v5e sweep: continuous-runner throughput vs (oversubscription, unroll).

Measures grads/sec of `build_fused_many_steps` at the flagship bench config
(4096 chains, d=100 hierarchical, 256 steps) for several packing/unroll
combinations. Best-of-N timing of a jitted on-device scalar reduction (the
axon tunnel returns from block_until_ready before remote completion for
large outputs — see ARCHITECTURE §4 measurement hazard).

Usage: python benchmarks/sweep_unroll.py '[ [4,1], [4,2], [4,4], [4,8] ]'
"""
import json
import os
import sys
import time

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
jax.config.update("jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import bench  # noqa: E402  (flagship config + warmup)


def main():
    combos = json.loads(sys.argv[1]) if len(sys.argv) > 1 else [[4, 1], [4, 4]]
    repeats = int(os.environ.get("SWEEP_REPEATS", "3"))

    rng_key = jax.random.key(2026)
    warm_key, run_key = jax.random.split(rng_key)
    step_size, imm = bench._warmup_params(warm_key)
    print(f"warmup: step_size={step_size:.5f}", file=sys.stderr)

    from blackjax_tpu.mcmc.nuts import build_fused_many_steps

    import blackjax_tpu

    algo = blackjax_tpu.nuts(
        bench.hierarchical_logdensity,
        step_size=step_size,
        inverse_mass_matrix=imm,
        max_num_doublings=bench.MAX_DOUBLINGS,
    )
    init_keys = jax.random.split(run_key, bench.NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (bench.DIM,)))(init_keys)
    states = jax.vmap(algo.init)(positions)
    step_keys = jax.random.split(run_key, bench.NUM_STEPS)
    rng_keys = jax.vmap(lambda k: jax.random.split(k, bench.NUM_CHAINS))(step_keys)

    results = {}
    for combo in combos:
        m, u = combo[0], combo[1]
        r = combo[2] if len(combo) > 2 else 1
        run = build_fused_many_steps(
            bench.hierarchical_logdensity,
            step_size,
            imm,
            num_steps=bench.NUM_STEPS,
            max_num_doublings=bench.MAX_DOUBLINGS,
            track_fn=lambda s: s.position[: bench.TRACKED_DIMS],
            oversubscription=m,
            unroll=u,
            restart_every=r,
        )

        @jax.jit
        def run_sum(rng_keys, states):
            final, hist, grads = run(rng_keys, states)
            # on-device scalar digest: forces full execution, tiny transfer
            return jnp.sum(hist), grads

        digest, grads = run_sum(rng_keys, states)
        jax.block_until_ready((digest, grads))
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            digest, grads = run_sum(rng_keys, states)
            jax.block_until_ready((digest, grads))
            best = min(best, time.perf_counter() - t0)
        gps = int(grads) / best
        results[f"m{m}_u{u}_r{r}"] = {
            "elapsed_best": round(best, 4),
            "grads_per_sec": round(gps, 1),
            "digest": float(digest),
            "grads": int(grads),
        }
        print(f"m={m} unroll={u} restart={r}: {best:.3f}s  {gps/1e6:.2f}M grads/s", file=sys.stderr)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
