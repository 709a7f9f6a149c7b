"""v5e measurement: the in-kernel (Pallas) continuous NUTS machine vs the
XLA continuous runner at the flagship bench config.

Prints one JSON line with grads/sec for both paths and the fused/XLA ratio.
Timing: jitted scalar digest, best-of-N (ARCHITECTURE §4 tunnel hazard).
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

import bench  # noqa: E402


def main():
    repeats = int(os.environ.get("SWEEP_REPEATS", "3"))
    tile = int(os.environ.get("FNUTS_TILE", "256"))
    budget = int(os.environ.get("FNUTS_BUDGET", str(32 * bench.NUM_STEPS)))
    chunk = int(os.environ.get("FNUTS_CHUNK", "128"))

    rng_key = jax.random.key(2026)
    warm_key, run_key = jax.random.split(rng_key)
    step_size, imm = bench._warmup_params(warm_key)
    print(f"warmup: step_size={step_size:.5f}", file=sys.stderr)

    from blackjax_tpu.ops.fused_leapfrog import make_gaussian_target
    from blackjax_tpu.ops.fused_nuts import (
        fused_nuts_run,
        make_mxu_safe_hierarchical_target,
    )

    if os.environ.get("FNUTS_TARGET", "hierarchical") == "gaussian":
        target = make_gaussian_target(bench.DIM)
    else:
        target = make_mxu_safe_hierarchical_target(bench.DIM)
    init_keys = jax.random.split(run_key, bench.NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (bench.DIM,)))(init_keys)

    @jax.jit
    def run_fused(x):
        fx, hist, grads, steps = fused_nuts_run(
            x,
            jnp.asarray(imm),
            step_size,
            target=target,
            num_steps=bench.NUM_STEPS,
            max_num_doublings=bench.MAX_DOUBLINGS,
            seed=7,
            num_track=bench.TRACKED_DIMS,
            tile_chains=tile,
            budget=budget,
            chunk=chunk,
        )
        return jnp.sum(hist), grads, jnp.min(steps)

    digest, grads, min_steps = run_fused(positions)
    jax.block_until_ready(grads)
    if int(min_steps) < bench.NUM_STEPS:
        print(
            f"WARNING: budget exhausted (min_steps={int(min_steps)})",
            file=sys.stderr,
        )
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = run_fused(positions)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    fused_gps = float(grads) / best

    # XLA continuous runner at current defaults (m=4, u=4)
    ours = bench.bench_ours_fused(run_key, step_size, jnp.asarray(imm))
    xla_gps = ours[2] / ours[0]

    print(
        json.dumps(
            {
                "fused_grads_per_sec": round(fused_gps, 1),
                "fused_elapsed": round(best, 4),
                "fused_grads": float(grads),
                "fused_min_steps": int(min_steps),
                "mean_traj": round(
                    float(grads) / (bench.NUM_CHAINS * bench.NUM_STEPS), 2
                ),
                "xla_grads_per_sec": round(xla_gps, 1),
                "ratio": round(fused_gps / xla_gps, 3),
                "tile": tile,
                "budget": budget,
            }
        )
    )


if __name__ == "__main__":
    main()
