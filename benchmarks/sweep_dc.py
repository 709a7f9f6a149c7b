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

    from benchmarks import timing

    pos_variants = [
        (
            0.5
            * jax.vmap(lambda k: jax.random.normal(k, (bench.DIM,)))(
                jax.random.split(jax.random.fold_in(run_key, i), bench.NUM_CHAINS)
            ),
        )
        for i in range(1 + repeats)
    ]

    for tile in tiles:
        for chunk in chunks:

            @jax.jit
            def run(x, t=tile, c=chunk):
                fx, h, g, s = fused_nuts_run_dc(
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
                return jnp.stack(
                    [
                        jnp.asarray(g, jnp.float32),
                        jnp.min(s).astype(jnp.float32),
                        timing.checksum((fx, h)),
                    ]
                )

            try:
                # distinct inputs per dispatch + on-device checksum pull
                # (benchmarks/timing.py: result cache + early return)
                best, vals = timing.timeit_pull(run, pos_variants)
            except Exception as exc:
                print(json.dumps({"tile": tile, "chunk": chunk, "error": str(exc)[:200]}))
                continue
            grads, min_steps = vals[0], int(vals[1])
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
