"""Attribution + roofline probe for the dc NUTS machine (VERDICT r3 #7).

Runs the flagship config with each FNUTS_DISABLE feature knocked out
(attribution-only builds — NOT valid samplers) and prints grads/s per
variant, plus a VPU-roofline estimate: the kernel is select/bookkeeping
bound, so the ceiling is vector-op throughput, not HBM or MXU.

Run on the TPU box: ``python -m benchmarks.sweep_attribution``.
"""
import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

VARIANTS = ["", "rng", "ckpt", "hist", "exit", "rng,ckpt,hist"]


def _measure_one(disable: str) -> float:
    """Each variant in a fresh subprocess (FNUTS_DISABLE is read at trace
    time and jit caches would alias across variants)."""
    code = r"""
import os, sys, time
import jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", os.path.join(%r, ".jax_cache"))
sys.path.insert(0, %r)
from blackjax_tpu.ops.fused_nuts_dc import fused_nuts_run_dc, make_hierarchical_target_dc

DIM, C, S = 100, 4096, 64
target = make_hierarchical_target_dc(DIM)
xs = [0.5 * jax.random.normal(jax.random.key(i), (C, DIM)) for i in range(3)]

@jax.jit
def run(x):
    fx, hist, grads, steps = fused_nuts_run_dc(
        x, jnp.ones(DIM), 0.227, target=target, num_steps=S,
        max_num_doublings=8, seed=7, num_track=8, tile_chains=128,
        budget=64 * S, chunk=256)
    # scalar-pull timing: block_until_ready on a raw axon output returns
    # before execution completes (ARCHITECTURE "Measurement hazard")
    return grads + 0.0 * jnp.sum(hist[0, 0]) + 0.0 * jnp.sum(steps)

float(run(xs[0]))  # compile + warm (distinct inputs per dispatch below)
t0 = time.perf_counter()
g1 = float(run(xs[1]))
t1 = time.perf_counter()
g2 = float(run(xs[2]))
el = (t1 - t0 + time.perf_counter() - t1) / 2
print("RESULT", (g1 + g2) / 2 / el / 1e6, (g1 + g2) / 2, el)
"""
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, FNUTS_DISABLE=disable)
    proc = subprocess.run(
        [sys.executable, "-c", code % (repo, repo)],
        capture_output=True,
        text=True,
        env=env,
        timeout=900,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("RESULT"):
            _, gps, grads, el = line.split()
            return float(gps), float(grads), float(el)
    print(proc.stdout[-2000:], proc.stderr[-2000:], file=sys.stderr)
    raise RuntimeError(f"variant {disable!r} produced no RESULT")


def main():
    results = {}
    for disable in VARIANTS:
        gps, grads, el = _measure_one(disable)
        label = disable or "baseline"
        results[label] = gps
        print(f"{label:16s}: {gps:7.1f}M grads/s ({el:.3f}s)", flush=True)
    base = results["baseline"]
    for label, gps in results.items():
        if label != "baseline":
            print(f"  {label:16s}: {gps/base:5.2f}x baseline")


if __name__ == "__main__":
    main()
