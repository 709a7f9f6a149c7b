"""v5e measurement: tile/chunk sweep for the transposed (dim, chains)
in-kernel NUTS machine (`ops/fused_nuts_dc.py`) at the flagship bench config.

Prints one JSON line per configuration with grads/sec; best-of-N timing on a
jitted scalar digest (ARCHITECTURE §4 tunnel hazard).

Usage: SWEEP_TILES=128,256 SWEEP_CHUNKS=256,512 python -m benchmarks.sweep_dc
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
    tiles = [int(t) for t in os.environ.get("SWEEP_TILES", "128,256").split(",")]
    chunks = [int(c) for c in os.environ.get("SWEEP_CHUNKS", "256,512").split(",")]
    budget_mult = int(os.environ.get("SWEEP_BUDGET_MULT", "64"))

    rng_key = jax.random.key(2026)
    warm_key, run_key = jax.random.split(rng_key)
    step_size, imm = bench._warmup_params(warm_key)
    print(f"warmup: step_size={step_size:.5f}", file=sys.stderr)

    from blackjax_tpu.ops.fused_nuts_dc import (
        fused_nuts_run_dc,
        make_hierarchical_target_dc,
    )

    target = make_hierarchical_target_dc(bench.DIM)
    init_keys = jax.random.split(run_key, bench.NUM_CHAINS)
    positions = 0.5 * jax.vmap(lambda k: jax.random.normal(k, (bench.DIM,)))(init_keys)
    imm = jnp.asarray(imm)

    for tile in tiles:
        for chunk in chunks:
            run = jax.jit(
                lambda x, t=tile, c=chunk: fused_nuts_run_dc(
                    x,
                    imm,
                    step_size,
                    target=target,
                    num_steps=bench.NUM_STEPS,
                    max_num_doublings=bench.MAX_DOUBLINGS,
                    seed=7,
                    num_track=bench.TRACKED_DIMS,
                    tile_chains=t,
                    budget=budget_mult * bench.NUM_STEPS,
                    chunk=c,
                )
            )
            try:
                fx, hist, grads, steps = run(positions)
                jax.block_until_ready(grads)
            except Exception as exc:
                print(json.dumps({"tile": tile, "chunk": chunk, "error": str(exc)[:200]}))
                continue
            min_steps = int(jnp.min(steps))
            best = float("inf")
            for _ in range(repeats):
                t0 = time.perf_counter()
                out = run(positions)
                jax.block_until_ready(out[2])
                best = min(best, time.perf_counter() - t0)
            print(
                json.dumps(
                    {
                        "tile": tile,
                        "chunk": chunk,
                        "grads_per_sec": round(float(grads) / best, 1),
                        "elapsed": round(best, 4),
                        "grads": float(grads),
                        "min_steps": min_steps,
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
